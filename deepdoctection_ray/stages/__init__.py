"""Ray Data stage wrappers around the pure kernels.

Stateless work ships as plain functions to ``map_batches``; anything with warm
state (parsers, compiled patterns, broadcast lookup tables) is a callable
class run as an actor pool (``map_batches(Cls, concurrency=N)``) — the Ray
equivalent of the reference's ``PredictorBase.clone()`` one-instance-per-worker
pattern (``extern/base.py:253-271``).
"""
