"""Management layer: content-addressed snapshot store, diff, 3-way merge,
branches (the reference's DCL surface, lib/management/)."""
