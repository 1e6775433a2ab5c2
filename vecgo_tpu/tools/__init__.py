"""Operational CLI tools (offline writer-process jobs).

The reference separates writers from stateless read replicas over a shared
store (vecgo.go:151-179, engine.go:380-420); these tools are the writer-side
jobs you run out-of-process. On TPU there is an extra reason to do so: heavy
build programs (compaction's graph build) can poison the in-process jax
runtime (utils/devbug.py), so production serving keeps builds in a separate
process — the serving process just reopens the new manifest version.
"""
