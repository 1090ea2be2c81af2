"""Remote (object-store) backend: durability side-channel.

Reference: server/remote/RemoteBackend.java:27 (abstract blob API for global
state, index state, point state, index files, warming queries) and
server/remote/s3/S3Backend.java:81. The GCS/S3 client is not available in
this environment, so the production backend is gated; LocalFileBackend is the
test double (the reference tests against findify S3Mock the same way,
SURVEY.md §4).
"""

from nrtsearch_tpu.remote.backend import LocalFileBackend, RemoteBackend

__all__ = ["LocalFileBackend", "RemoteBackend"]
