"""Device-mesh parallelism: sharded counting (all_to_all k-mer routing),
halo-exchange sequence parallelism, multi-host runtime helpers."""
