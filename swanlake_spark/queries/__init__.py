"""Declared query sets: the SURVEY §2.5 oracle corpus and the
TPC-H-shaped bench suite."""
