"""Plugin system: extension-point registries.

Reference: server/plugins/ (jar classloader plugins with 15 extension
interfaces — Analysis, Blender, Collector, CustomRequest, FetchTask,
FieldType, Highlighter, HitsLogger, Ingestion, Metrics, Rescorer, Script,
Similarity; PluginsService + CustomRequestProcessor.java:43). The Python
re-expression: plugins are modules exposing a ``register(registry)`` hook,
loaded from config by import path or via the ``nrtsearch_tpu.plugins``
entry-point group; extension points are plain callables in this registry.
"""

from __future__ import annotations

import importlib
import logging
from typing import Callable, Optional

log = logging.getLogger("nrtsearch_tpu.plugins")


class PluginRegistry:
    def __init__(self) -> None:
        self.custom_request_handlers: dict[str, Callable] = {}  # id -> fn(path, params) -> dict
        self.hits_loggers: dict[str, Callable] = {}             # name -> fn(index, request, hits)
        self.rescorers: dict[str, Callable] = {}                # name -> fn(searcher, hits, params)
        self.blenders: dict[str, Callable] = {}                 # name -> fn(results, weights) -> hits
        self.collectors: dict[str, Callable] = {}               # name -> fn(matches, params) -> dict
        self.similarities: dict[str, Callable] = {}             # name -> scorer factory
        self.ingestors: list = []                               # Ingestor instances

    # -- analyzers / fields / scripts reuse the module-level registries ---------

    def register_analyzer(self, analyzer) -> None:
        from nrtsearch_tpu.analysis import register_analyzer

        register_analyzer(analyzer)

    def register_field_type(self, name: str, factory) -> None:
        from nrtsearch_tpu.schema.fields import register_field_type

        register_field_type(name, factory)

    def register_custom_request_handler(self, plugin_id: str, fn: Callable) -> None:
        self.custom_request_handlers[plugin_id] = fn

    def register_hits_logger(self, name: str, fn: Callable) -> None:
        self.hits_loggers[name] = fn

    def register_rescorer(self, name: str, fn: Callable) -> None:
        self.rescorers[name] = fn

    def register_blender(self, name: str, fn: Callable) -> None:
        self.blenders[name] = fn

    def register_collector(self, name: str, fn: Callable) -> None:
        """Additional-collector plugin (reference: CollectorCreator +
        PluginCollector, search.proto:859): fn(matches, params) -> dict
        packed into CollectorResult.anyResult as a Struct."""
        self.collectors[name] = fn

    def register_similarity(self, name: str, factory: Callable) -> None:
        self.similarities[name] = factory

    def register_script_engine(self, lang: str, compile_fn) -> None:
        from nrtsearch_tpu.script.expr import register_script_engine

        register_script_engine(lang, compile_fn)

    def register_ingestor(self, ingestor) -> None:
        self.ingestors.append(ingestor)


class Ingestor:
    """Pull-based ingestion plugin base (reference: server/ingestion/Ingestor
    .java:40 — lifecycle initialize/start/stop, addDocuments, commit)."""

    def initialize(self, global_state) -> None: ...

    def start(self) -> None: ...

    def stop(self) -> None: ...


def load_plugins(names: list[str], registry: PluginRegistry,
                 remote=None, service: str = "") -> None:
    """Load plugins by module path (config ``plugins:`` list), entry point,
    or object-store location. A ``remote://<name>`` entry downloads the
    plugin module from the configured RemoteBackend (stored as the current
    version of resource ``plugin_<name>``) to a temp dir and loads it from
    there (reference: PluginsService + PluginDownloader pulling plugin
    artifacts from S3, server/plugins/PluginDownloader.java)."""
    for name in names:
        loaded = False
        if name.startswith("remote://"):
            if remote is None:
                log.warning("plugin %s needs a remote backend", name)
                continue
            try:
                import sys as _sys
                import tempfile
                from pathlib import Path

                mod_name = name[len("remote://"):]
                data = remote.download_current(service, f"plugin_{mod_name}")
                if data is None:
                    raise FileNotFoundError(f"plugin_{mod_name} not in store")
                pdir = Path(tempfile.mkdtemp(prefix="nrt_plugin_"))
                (pdir / f"{mod_name}.py").write_bytes(data)
                _sys.path.insert(0, str(pdir))
                name = mod_name
            except Exception:
                log.warning("plugin download failed: %s", name, exc_info=True)
                continue
        try:
            mod = importlib.import_module(name)
            if hasattr(mod, "register"):
                mod.register(registry)
                loaded = True
        except ImportError:
            pass
        if not loaded:
            try:
                from importlib.metadata import entry_points

                for ep in entry_points(group="nrtsearch_tpu.plugins"):
                    if ep.name == name:
                        ep.load()(registry)
                        loaded = True
            except Exception:
                pass
        if loaded:
            log.info("loaded plugin %s", name)
        else:
            log.warning("plugin %s not found", name)
