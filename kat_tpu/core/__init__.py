"""Compute core: k-mer packing/extraction, sorted count tables, reductions.

Key modules: kmers (2-bit packing, windows, canonical), counting (narrow
tables + streaming counters), wide (k>31 tables), tables (generic adapter),
stats, comp_engine, coverage, distance, matrix.
"""
