"""ctypes binding for the native C++ data-pipeline library (built lazily).

Falls back gracefully (``available() -> False``) when the shared library has
not been built; pure-numpy paths in ``nvsf_tpu.lib`` are used instead.
"""
def available() -> bool:
    return False
