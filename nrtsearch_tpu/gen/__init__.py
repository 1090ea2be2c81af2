"""Generated protobuf code for the wire-compatible ``luceneserver`` schema.

The .proto sources live in ``proto/yelp/nrtsearch/`` and are machine-derived
from the reference's published wire schema by ``tools/gen_wire_proto.py``
(see that tool's docstring). Regenerate with:

    python tools/gen_wire_proto.py
    protoc -Iproto -I<site-packages> --python_out=nrtsearch_tpu/gen \
        proto/yelp/nrtsearch/*.proto
    sed -i 's/^from yelp\\.nrtsearch import/from nrtsearch_tpu.gen.yelp.nrtsearch import/' \
        nrtsearch_tpu/gen/yelp/nrtsearch/*_pb2.py

``pb`` aggregates every message/enum from the three schema modules plus the
google well-known types the API surface uses (HttpBody metrics, LatLng geo
points, Empty), so engine code writes ``pb.SearchRequest`` etc. without
caring which .proto file defines a symbol — exactly how the reference's
``com.yelp.nrtsearch.server.grpc`` flat java package reads.
"""

import types as _types

from google.api import httpbody_pb2 as _httpbody
from google.protobuf import empty_pb2 as _empty
from google.protobuf import wrappers_pb2 as _wrappers
from google.type import latlng_pb2 as _latlng

from nrtsearch_tpu.gen.yelp.nrtsearch import (  # noqa: F401
    analysis_pb2,
    luceneserver_pb2,
    search_pb2,
)

pb = _types.SimpleNamespace()
for _mod in (analysis_pb2, search_pb2, luceneserver_pb2):
    for _name in dir(_mod):
        if not _name.startswith("_") and _name not in ("DESCRIPTOR",):
            setattr(pb, _name, getattr(_mod, _name))
pb.HttpBody = _httpbody.HttpBody
pb.Empty = _empty.Empty
pb.LatLng = _latlng.LatLng
pb.Int32Value = _wrappers.Int32Value
pb.Int64Value = _wrappers.Int64Value
pb.UInt32Value = _wrappers.UInt32Value
pb.UInt64Value = _wrappers.UInt64Value
pb.DoubleValue = _wrappers.DoubleValue
pb.FloatValue = _wrappers.FloatValue
pb.BoolValue = _wrappers.BoolValue
pb.StringValue = _wrappers.StringValue

__all__ = ["pb"]
