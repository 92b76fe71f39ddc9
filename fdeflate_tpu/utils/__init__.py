"""Utilities: profiling counters, configuration."""
