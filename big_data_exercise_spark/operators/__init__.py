"""Batch relational operator layer (SURVEY.md §2).

Each module re-expresses one family of reference operators as
idiomatic, composable DataFrame functions. Every function takes
DataFrames in and returns a lazy DataFrame out — no actions, no
driver-side loops — so Catalyst sees the whole plan and the same code
runs at sf0.001 and at 100 TB.
"""
