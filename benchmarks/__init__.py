"""Benchmark suite package (import root for the shared host-fed harness)."""
