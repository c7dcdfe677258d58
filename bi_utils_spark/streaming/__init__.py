"""Streaming variants of the reference's stateful semantics
(SURVEY.md §2.12): delta-load watermarks and alert dedup."""
