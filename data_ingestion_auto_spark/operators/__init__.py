"""Operator library: relational compositions and domain operators.

Modules here expose engine-level APIs (DataFrame → DataFrame); the
``plans`` package wires them into named, oracle-checked queries.
"""
