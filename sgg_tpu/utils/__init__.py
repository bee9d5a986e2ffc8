"""Shared utilities: logging, profiling, misc."""
