"""Reference-workload parity: each module re-expresses one reference
script (hw0/hw2/hw3/hw4/FinalProject) over its ORIGINAL dataset format,
built entirely from the engine's readers/operators — the migration path
for a user of the reference repo (schemas: FIXTURES.md §1)."""

from . import final_tweets, hw0_power, hw2_news, hw3_reuters, hw4_movielens  # noqa: F401
