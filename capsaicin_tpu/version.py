__version__ = "0.2.0"  # round 2: traversal rework, runtime variants, parity oracle
