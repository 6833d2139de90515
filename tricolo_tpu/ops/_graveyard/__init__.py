"""Recorded dead ends — NOT production paths.

Modules here compiled or measured WORSE than the shipped formulation (or,
for dma_tiles, do not compile on real hardware at all) and are kept only
as engineering record so the next attempt starts from facts. Nothing in
the package imports from here; see each module's STATUS docstring and
PERF.md for the measurements that retired it.
"""
