"""Assembled dataflow plans (DataFrame-first, Catalyst-optimized)."""
