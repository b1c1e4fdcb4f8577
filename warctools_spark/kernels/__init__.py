"""Pure-Python byte-level kernels (no Spark imports allowed here).

Each kernel is a clean-room reimplementation of the corresponding
behavior in the reference (internetarchive/warctools); docstrings cite
the reference file:line whose semantics are cloned. The kernels are
batch-oriented (whole payload in memory) because in the Spark engine
they always run over Arrow record batches inside pandas UDFs.
"""
