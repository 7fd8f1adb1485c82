"""Pure computation kernels (numpy / stdlib only — no Ray imports).

Every kernel is deterministic and row-local: it operates on the contents of a
single transcript turn (the analog of one page in the reference). Ray stages
wrap these in ``map_batches`` bodies; tests call them directly.
"""
