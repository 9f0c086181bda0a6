"""Operator catalog: transforms, joins, aggregates, validation, quality."""
