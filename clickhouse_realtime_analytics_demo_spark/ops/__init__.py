"""Operational surface: query log, table introspection, explain."""
