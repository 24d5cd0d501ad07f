"""Multi-hop crawl flows: enrichment joins, package expansion,
pagination — the reference's spider *shapes* (SURVEY.md §3) expressed
as DataFrame compositions over the frontier engine.
"""
