"""Generated protobuf code (protoc --python_out over proto/nrtsearch_tpu.proto).

Regenerate with:  protoc --python_out=nrtsearch_tpu/gen --proto_path=proto \
                    proto/nrtsearch_tpu.proto
"""

from nrtsearch_tpu.gen import nrtsearch_tpu_pb2 as pb  # noqa: F401

__all__ = ["pb"]
