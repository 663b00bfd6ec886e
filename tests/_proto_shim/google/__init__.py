"""Namespace bridge to a vendored pure-python ``google.protobuf``.

The transformWithStateInPandas driver-worker protocol imports
``google.protobuf``, which this container's site-packages lacks. The
Google Cloud SDK image layer ships a pure-python protobuf under the
App Engine tooling; this package extends the ``google`` namespace to
it so the streaming state-server tests can run end-to-end instead of
importorskipping.

Resolution order keeps any REAL install authoritative:
``pkgutil.extend_path`` first merges every ``google/`` directory on
``sys.path`` (a genuine site-packages protobuf wins), and the vendored
path is appended last, only if it exists. Nothing else from the SDK
tree is exposed — only this one ``google`` package entry.
"""

import os
import pkgutil

__path__ = pkgutil.extend_path(__path__, __name__)

_vendor = os.environ.get(
    "SPARK_GRAFT_PROTOBUF_VENDOR",
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google",
)
if os.path.isdir(os.path.join(_vendor, "protobuf")):
    __path__.append(_vendor)
