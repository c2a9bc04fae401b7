"""Per-family query modules (split from the round-5 monolithic
registry.py).  Import order — and therefore registration order —
is owned by ``..registry``; do not import these modules directly.
"""
