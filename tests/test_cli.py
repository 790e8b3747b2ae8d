"""CLI e2e: the reference's command surface driven end-to-end in-process
(create → list → version create → status → delete), with the reference's
exit codes (0 success, 3 conflict, 1 unknown/404)."""

from __future__ import annotations

import json

import pytest

from geostore_spark import cli

from .stac_fixtures import build_golden_tree


@pytest.fixture()
def roots(tmp_path):
    return {
        "store": str(tmp_path / "store"),
        "storage": str(tmp_path / "storage"),
        "tree": build_golden_tree(str(tmp_path)),
    }


def _run(capsys, roots, *argv) -> tuple[int, str, str]:
    code = cli.main(["--store", roots["store"], "--storage", roots["storage"], *argv])
    captured = capsys.readouterr()
    return code, captured.out, captured.err


def test_cli_full_lifecycle(spark, capsys, roots):
    code, out, _ = _run(capsys, roots, "dataset", "create", "--title", "Cli_DS")
    assert code == 0
    dataset_id = json.loads(out)["id"]

    # duplicate title → conflict exit code 3 (reference ExitCode.CONFLICT)
    code, _, err = _run(capsys, roots, "dataset", "create", "--title", "Cli_DS")
    assert code == 3 and "already exists" in err

    code, out, _ = _run(capsys, roots, "dataset", "list")
    assert code == 0 and [d["title"] for d in json.loads(out)] == ["Cli_DS"]

    code, out, _ = _run(
        capsys, roots, "version", "create",
        "--dataset-id", dataset_id, "--metadata-url", roots["tree"]["root_url"],
    )
    assert code == 0
    body = json.loads(out)
    execution_id = body["execution_id"]
    assert body["new_version_id"]

    code, out, _ = _run(capsys, roots, "version", "status", "--execution-id", execution_id)
    assert code == 0
    status = json.loads(out)
    assert status["step function"]["status"] == "Succeeded"
    assert status["validation"]["status"] == "Passed"

    # import wrote assets under <storage>/<title>/ → delete conflicts (409)
    code, _, err = _run(capsys, roots, "dataset", "delete", "--id", dataset_id)
    assert code == 3 and "not empty" in err

    # unknown id → 404 → unknown exit code 1
    code, _, _ = _run(capsys, roots, "dataset", "get", "--id", "nope")
    assert code == 1


def test_cli_query_list_and_run(spark, capsys, roots, tmp_path):
    code, out, _ = _run(capsys, roots, "query", "list")
    assert code == 0
    keys = {line.split("\t")[0] for line in out.strip().splitlines()}
    assert {"a5_status_rollup", "x_graph_pagerank", "x_stats_profile"} <= keys

    code, out, _ = _run(
        capsys, roots, "query", "run", "a1_filtered_count",
        "--sf-dir", "/root/testdata/sf0.001", "--limit", "5",
    )
    assert code == 0 and "n" in out  # a show() table rendered

    code, _, err = _run(capsys, roots, "query", "run", "no_such_query")
    assert code == 1 and "unknown query" in err


def test_cli_table_admin_surface(spark, capsys, roots):
    code, out, _ = _run(capsys, roots, "dataset", "create", "--title", "Admin_DS")
    assert code == 0

    # a second snapshot so history/vacuum have something to act on
    code, _, _ = _run(
        capsys, roots, "dataset", "update",
        "--id", json.loads(out)["id"], "--title", "Admin_DS2",
    )
    assert code == 0

    code, out, _ = _run(capsys, roots, "table", "history", "datasets")
    assert code == 0
    hist = json.loads(out)
    assert [h["version"] for h in hist] == [0, 1]

    code, out, _ = _run(capsys, roots, "table", "compact", "datasets")
    assert code == 0 and json.loads(out)["files_out"] == 1

    code, out, _ = _run(capsys, roots, "table", "vacuum", "datasets")
    assert code == 0
    assert json.loads(out)["removed"] == [0, 1]  # compact made v2 current

    code, out, _ = _run(capsys, roots, "table", "show", "datasets")
    assert code == 0 and "Admin_DS2" in out


def test_cli_compact_cluster_flags(spark, capsys, roots):
    """`table compact --cluster-by` routes through the clustered rewrite
    and still produces a readable, content-identical snapshot."""
    code, out, _ = _run(capsys, roots, "dataset", "create", "--title", "Cl_DS")
    assert code == 0
    code, out, _ = _run(
        capsys, roots, "table", "compact", "datasets",
        "--target-files", "1", "--cluster-by", "dataset_id",
    )
    assert code == 0
    assert json.loads(out)["files_out"] == 1
    code, out, _ = _run(capsys, roots, "table", "show", "datasets")
    assert code == 0 and "Cl_DS" in out


def test_cli_table_changes(spark, capsys, roots):
    """`table changes --from-version N` prints the CDF rows between two
    snapshots — insert for the created row, delete+insert for the
    title update."""
    code, out, _ = _run(capsys, roots, "dataset", "create", "--title", "Cdf_DS")
    assert code == 0
    code, _, _ = _run(
        capsys, roots, "dataset", "update",
        "--id", json.loads(out)["id"], "--title", "Cdf_DS2",
    )
    assert code == 0

    code, out, _ = _run(
        capsys, roots, "table", "changes", "datasets", "--from-version", "0"
    )
    assert code == 0
    assert "insert" in out and "delete" in out
    assert "Cdf_DS2" in out  # the post-image row
