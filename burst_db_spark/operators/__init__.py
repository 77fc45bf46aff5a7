"""Operator library: each SURVEY.md §2 row as a composable DataFrame op."""
