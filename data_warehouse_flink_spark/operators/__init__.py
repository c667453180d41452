"""DataFrame-native operator library (SURVEY.md §2 inventory)."""
