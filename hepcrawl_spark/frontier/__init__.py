"""Distributed URL frontier.

The crawl "query engine" (SURVEY.md §2.3): URL-seen membership
(F1), priority queue + per-host politeness scheduling (F2/F3) with
explicit host-skew handling (F4), robots gating (F5), depth-first
round expansion (F6), resumable checkpoints (F7), and per-partition
lineage + error capture (F8).
"""
