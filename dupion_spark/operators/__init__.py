"""Relational + dedup operators, each a pure DataFrame -> DataFrame function."""
