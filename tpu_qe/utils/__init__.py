"""Utility subsystems: timing, profiling, config, logging, golden dumps."""
