"""Batch sources: readers for the reference's fixture formats."""
