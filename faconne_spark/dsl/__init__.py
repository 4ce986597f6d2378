"""Declarative nested-data transform DSL (domain → range), Spark-first."""
