"""Cross-cutting utilities: stage timers, jax.profiler tracing, sequence
string helpers."""
