"""Operators: Arrow pandas-UDF stages + relational building blocks."""
