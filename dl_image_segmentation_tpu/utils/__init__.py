"""Utilities: profiling counters, jax traces, visualization."""
