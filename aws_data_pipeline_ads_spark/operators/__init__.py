"""Distributed operators: relational, dedup, similarity, text, sessions.

Every operator here is a DataFrame→DataFrame transformation built from
declarative Spark SQL primitives so Catalyst/AQE plan the physical
execution (pushdown, broadcast vs shuffle, skew splitting). None of
them collect to the driver.
"""
