"""Composed query plans (the reference's end-to-end entry points) and
plan-inspection helpers for asserting physical properties (pushdown,
broadcast, codegen)."""
