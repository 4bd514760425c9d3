"""Ray Data stages: each is a ``Dataset -> Dataset`` transform (or a
callable-class batch fn for actor pools).  No stage calls ray.init()."""
