"""Pure, deterministic kernels (no Ray imports).

Everything here is usable both from the distributed stages and from the
sequential oracle, so the per-value semantics have a single source of
truth and the distributed tests exercise only the plumbing.
"""
