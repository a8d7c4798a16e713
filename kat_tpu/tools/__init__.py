"""The seven KAT workloads: hist, gcp, comp, sect, cold, filter kmer/seq,
plus shared input handling (common.py)."""
