"""Custom operators with no single built-in Spark primitive.

Each is a composition of DataFrame ops (the preferred form — stays in
Catalyst/codegen), never a driver-side loop.
"""
