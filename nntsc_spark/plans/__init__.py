"""Declarative query plans: the driver-facing query/oracle registry."""
