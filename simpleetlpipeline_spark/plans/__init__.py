"""Query plans: the analytics catalog and its oracle-SQL twins."""
