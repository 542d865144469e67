"""Utilities: profiling counters, manifests."""
