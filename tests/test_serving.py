"""MCP serving wrapper: full protocol loop over the navigation surface
(reference mcp_server_module/server.py tool parity, corpus-addressed)."""

import io
import json

import pytest

from docstrange_spark import datagen
from docstrange_spark.serving import TOOLS, DocServer


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("serve") / "spans")
    datagen.fixture_spans(spark).write.parquet(p)
    return p


@pytest.fixture(scope="module")
def server(spark):
    return DocServer(spark)


def _call(server, name, args, rid=1):
    resp = server.handle({
        "jsonrpc": "2.0", "id": rid, "method": "tools/call",
        "params": {"name": name, "arguments": args},
    })
    assert "error" not in resp, resp
    return json.loads(resp["result"]["content"][0]["text"])


DOC = "md_structure-00000000"


def test_initialize_and_tool_listing(server):
    init = server.handle({"jsonrpc": "2.0", "id": 0, "method": "initialize"})
    assert init["result"]["serverInfo"]["name"] == "docstrange_spark"
    listing = server.handle({"jsonrpc": "2.0", "id": 1, "method": "tools/list"})
    names = {t["name"] for t in listing["result"]["tools"]}
    assert names == set(TOOLS) and len(names) == 12
    # notifications are silently accepted; unknown methods error
    assert server.handle({"jsonrpc": "2.0",
                          "method": "notifications/initialized"}) is None
    err = server.handle({"jsonrpc": "2.0", "id": 2, "method": "bogus"})
    assert err["error"]["code"] == -32601


def test_parse_and_navigate(server, corpus):
    info = _call(server, "parse_document",
                 {"corpus_path": corpus, "doc_id": DOC})
    assert info["status"] == "parsed" and info["n_sections"] >= 2
    assert info["recommendation"] == "full_document"

    headers = _call(server, "get_headers",
                    {"corpus_path": corpus, "doc_id": DOC})["headers"]
    assert headers and all(1 <= h["level"] <= 6 for h in headers)
    top = _call(server, "get_headers",
                {"corpus_path": corpus, "doc_id": DOC, "max_level": 1})
    assert all(h["level"] == 1 for h in top["headers"])

    full = _call(server, "get_full_content",
                 {"corpus_path": corpus, "doc_id": DOC})
    assert full["markdown"].startswith("#")

    sec = _call(server, "get_section", {
        "corpus_path": corpus, "doc_id": DOC,
        "section_title": headers[0]["title"].upper(),  # case-insensitive
    })
    assert sec["title"] == headers[0]["title"] and sec["content"]

    missing = _call(server, "get_section", {
        "corpus_path": corpus, "doc_id": DOC, "section_title": "no such",
    })
    assert "error" in missing and missing["available_sections"]

    sums = _call(server, "get_section_summaries",
                 {"corpus_path": corpus, "doc_id": DOC, "max_length": 30})
    assert all(len(s["summary"]) <= 33 for s in sums["summaries"])

    tree = _call(server, "get_hierarchical_structure",
                 {"corpus_path": corpus, "doc_id": DOC})
    assert isinstance(tree, dict) and tree

    cached = _call(server, "list_cached_documents", {})
    assert cached["count"] == 1 and corpus in cached["cached_documents"][0]


def test_search_matches_contract_kernel(server, corpus, spark):
    from docstrange_spark.operators import extract, navigation

    got = _call(server, "search_document",
                {"corpus_path": corpus, "doc_id": DOC, "query": "the"})
    md = (
        extract.extract(
            spark.read.parquet(corpus).where(f"doc_id = '{DOC}'"),
            include_spans=False,
        ).select("doc_id", "markdown")
    )
    want = navigation.search_relational(md, "the").orderBy("line_number").collect()
    assert got["n_results"] == len(want)
    assert [r["line_number"] for r in got["results"]] == [
        r["line_number"] for r in want
    ]


def test_chunks_roundtrip(server, corpus):
    ch = _call(server, "get_section_chunks",
               {"corpus_path": corpus, "doc_id": DOC, "max_tokens": 20})
    assert ch["n_chunks"] >= 1
    c0 = _call(server, "get_chunk_content", {
        "corpus_path": corpus, "doc_id": DOC,
        "chunk_index": 0, "max_tokens": 20,
    })
    full = _call(server, "get_full_content",
                 {"corpus_path": corpus, "doc_id": DOC})["markdown"]
    assert c0["content"] and c0["content"] in full
    oob = _call(server, "get_chunk_content", {
        "corpus_path": corpus, "doc_id": DOC,
        "chunk_index": 99, "max_tokens": 20,
    })
    assert "error" in oob


def test_documents_style_corpus_and_missing_doc(server):
    got = _call(server, "get_document_info", {
        "corpus_path": "/root/testdata/sf0.001/documents.parquet",
        "doc_id": "doc-0",
    }, rid=7)
    assert got["doc_id"] == "doc-0" and got["total_tokens"] > 0
    resp = server.handle({
        "jsonrpc": "2.0", "id": 8, "method": "tools/call",
        "params": {"name": "get_full_content",
                   "arguments": {"corpus_path":
                                 "/root/testdata/sf0.001/documents.parquet",
                                 "doc_id": "doc-999999"}},
    })
    assert resp["error"]["code"] == -32000


def test_stdio_loop(server, corpus):
    lines = [
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"}),
        "not json at all",
        json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                    "params": {"name": "get_document_info",
                               "arguments": {"corpus_path": corpus,
                                             "doc_id": DOC}}}),
    ]
    out = io.StringIO()
    server.serve(stdin=io.StringIO("\n".join(lines) + "\n"), stdout=out)
    resps = [json.loads(l) for l in out.getvalue().splitlines()]
    assert [r["id"] for r in resps] == [1, 2]  # garbage + notification skipped
    info = json.loads(resps[1]["result"]["content"][0]["text"])
    assert info["n_sections"] >= 2


def test_search_corpus_matches_cli_path(server, capsys):
    """The corpus-level search_corpus tool answers from the same
    retrieval.bm25_search kernel as the CLI's --search — identical
    ranks, ids, and scores for the same query."""
    from docstrange_spark import cli

    src = "/root/testdata/sf0.001/documents.parquet"
    out = _call(server, "search_corpus",
                {"corpus_path": src, "query": "spark window", "top_k": 3})
    assert out["n_results"] == 3
    assert [h["rank"] for h in out["results"]] == [1, 2, 3]

    assert cli.main([src, "--search", "spark window",
                     "--top-k", "3", "--cpus", "4"]) == 0
    cli_hits = [json.loads(l)
                for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert out["results"] == cli_hits

    # empty query: structured error, no traceback
    err = _call(server, "search_corpus",
                {"corpus_path": src, "query": "   "})
    assert err == {"error": "empty query"}


def test_search_corpus_passage_granularity(server):
    """granularity=passage answers from the shared passage_corpus helper
    — ids are doc_id#section_idx and match the contract query's ranks."""
    import __spark_entry__ as em

    src = "/root/testdata/sf0.001/documents.parquet"
    out = _call(server, "search_corpus",
                {"corpus_path": src, "query": "spark window",
                 "top_k": 5, "granularity": "passage"})
    assert out["n_results"] == 5
    assert all("#" in h["doc_id"] for h in out["results"])
    contract = {
        r["passage_id"]: (r["rank"], r["score"])
        for r in em.queries()["passage_search"](
            server.spark, "/root/testdata/sf0.001"
        ).collect()
    }
    for h in out["results"]:
        assert contract[h["doc_id"]] == (h["rank"], h["score"])
