"""Placeholder — filled in as the corresponding SURVEY.md §2 block lands."""
