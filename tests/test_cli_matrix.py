"""CLI subcommand matrix: drive the full index lifecycle through
nrtsearch_client subcommands against a live server (reference:
tools/cli picocli commands + IndexLifecycleCommandsTest style)."""

import json

import pytest

from nrtsearch_tpu.cli import main as cli_main
from nrtsearch_tpu.client import NrtsearchClient
from nrtsearch_tpu.config import NrtsearchConfig
from nrtsearch_tpu.server.grpc_server import NrtsearchServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    srv = NrtsearchServer(NrtsearchConfig.from_dict(
        {"stateDir": str(tmp / "s"), "indexDir": str(tmp / "i")}
    ))
    port = srv.start(0)
    yield srv, port, tmp
    srv.stop()


def _run(port, *argv) -> int:
    return cli_main(["--port", str(port), *argv])


def test_cli_lifecycle(server, capsys):
    srv, port, tmp = server

    fields = tmp / "fields.json"
    fields.write_text(json.dumps({
        "indexName": "cidx",
        "field": [
            {"name": "id", "type": "_ID", "store": True},
            {"name": "body", "type": "TEXT", "search": True},
            {"name": "price", "type": "INT", "storeDocValues": True,
             "sort": True},
        ],
    }))
    docs = tmp / "docs.json"
    docs.write_text("\n".join(json.dumps({
        "id": str(i), "body": f"sample text number {i}", "price": i * 10,
    }) for i in range(6)))
    query = tmp / "query.json"
    query.write_text(json.dumps({
        "indexName": "cidx", "topHits": 3, "retrieveFields": ["id"],
        "query": {"matchQuery": {"field": "body", "query": "sample"}},
    }))

    assert _run(port, "createIndex", "--indexName", "cidx") == 0
    assert _run(port, "registerFields", "--fileName", str(fields)) == 0
    assert _run(port, "startIndex", "--indexName", "cidx") == 0
    assert _run(port, "addDocuments", "--indexName", "cidx",
                "--fileName", str(docs), "--fileType", "json") == 0
    assert _run(port, "refresh", "--indexName", "cidx") == 0

    capsys.readouterr()
    assert _run(port, "search", "--fileName", str(query)) == 0
    out = capsys.readouterr().out
    assert '"totalHits"' in out and '"value": "6"' in out or "6" in out

    for argv in [
        ("stats", "--indexName", "cidx"),
        ("indices",),
        ("status",),
        ("ready", "--indexNames", "cidx"),
        ("state", "--indexName", "cidx"),
        ("indexState", "--indexName", "cidx"),
        ("globalState",),
        ("nodeInfo",),
        ("commit", "--indexName", "cidx"),
        ("createSnapshot", "--indexName", "cidx"),
        ("getAllSnapshotIndexGen", "--indexName", "cidx"),
        ("forceMerge", "--indexName", "cidx", "--maxSegments", "1"),
        ("forceMergeDeletes", "--indexName", "cidx"),
    ]:
        assert _run(port, *argv) == 0, argv

    # warming backup needs an object store: errors loudly without one
    assert _run(port, "backupWarmingQueries", "--indexName", "cidx") == 1

    # release the snapshot created above
    capsys.readouterr()
    assert _run(port, "getAllSnapshotIndexGen", "--indexName", "cidx") == 0
    gens = json.loads(capsys.readouterr().out)
    gen = int(gens["indexGens"][0]) if gens.get("indexGens") else 1
    assert _run(port, "releaseSnapshot", "--indexName", "cidx",
                "--indexGen", str(gen)) == 0

    # delete path + error surface: unknown index fails non-zero
    assert _run(port, "deleteAllDocuments", "--indexName", "cidx") == 0
    assert _run(port, "stopIndex", "--indexName", "cidx") == 0
    assert _run(port, "deleteIndex", "--indexName", "cidx") == 0
    assert _run(port, "stats", "--indexName", "cidx") == 1  # gone -> error
