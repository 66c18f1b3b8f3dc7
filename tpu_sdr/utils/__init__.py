"""Shared utilities: filter design, unit parsing, logging, metrics."""
