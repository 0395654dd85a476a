"""Engine operators.

Each module re-expresses one family of the reference's operator
inventory (SURVEY.md §2) Spark-first: declarative DataFrame plans
that Catalyst can push down, prune, and parallelize — never
driver-side loops.
"""
