"""Relax protobuf's gencode/runtime version gate for the vendored copy.

pyspark 4.1 ships StateMessage_pb2 generated with protobuf 6.33; the
vendored pure-python runtime is 6.32, and protobuf refuses to load
gencode newer than the runtime. The 6.32->6.33 delta does not touch
the generated-code API surface this proto uses (verified by running
the transformWithStateInPandas end-to-end test against the batch
twin), so for TEST runs the validation is downgraded to permissive.

This module is a ``sitecustomize``: every Python interpreter whose
``PYTHONPATH`` includes this directory — the pytest process AND the
Spark Python workers the JVM forks, which is what makes the worker
side work — applies the patch at startup. It is inert when protobuf
is absent, and a real (current) protobuf install never trips the
original validator, so wrapping it is a no-op there.
"""


def apply() -> None:
    try:
        from google.protobuf import runtime_version as _rv
    except Exception:
        return
    orig = _rv.ValidateProtobufRuntimeVersion
    if getattr(orig, "_spark_graft_lenient", False):
        return

    def _lenient(domain, major, minor, patch, suffix, location):
        try:
            orig(domain, major, minor, patch, suffix, location)
        except _rv.VersionError:
            pass

    _lenient._spark_graft_lenient = True
    _rv.ValidateProtobufRuntimeVersion = _lenient


apply()
