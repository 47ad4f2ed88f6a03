"""Operator CLI: kvctl (limits) and kvtop (live memory view)."""
