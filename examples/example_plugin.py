"""Example plugin (reference: example-plugin/ExamplePlugin.java).

A plugin is a module exposing ``register(registry)``. Load it via the server
config:

    plugins:
      - examples.example_plugin

or install it as a package exposing the ``nrtsearch_tpu.plugins`` entry point.
"""

from nrtsearch_tpu.analysis import Analyzer
from nrtsearch_tpu.analysis.analyzers import lowercase_filter, whitespace_tokenizer


def register(registry) -> None:
    # a custom analyzer usable in Field.analyzer as {"predefined": "example_ws_lower"}
    registry.register_analyzer(
        Analyzer("example_ws_lower", whitespace_tokenizer, [], [lowercase_filter])
    )

    # a custom request handler served at the `custom` RPC under id "example"
    def hello(path, params):
        return {"hello": params.get("name", "world"), "path": path}

    registry.register_custom_request_handler("example", hello)

    # a hits logger that counts logged hits
    def log_hits(index_name, request, hits):
        log_hits.count = getattr(log_hits, "count", 0) + len(hits)

    registry.register_hits_logger("example_logger", log_hits)
