"""Golden STAC tree fixtures, mirroring the reference's minimal valid
documents (tests/stac_objects.py:80-140) and its e2e tree shape
(tests/test_processing_stack.py:131-279): catalog → child collection →
item → assets with correct sha256 multihashes, one ./-relative href, and
one revisited URL for cycle-safety.
"""

from __future__ import annotations

import json
import os

from geostore_spark.pipeline.checksums import sha256_multihash

STAC_VERSION = "1.0.0"


def _write_json(path: str, doc: dict) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(doc, f)
    return path


def minimal_catalog(links: list[dict]) -> dict:
    return {
        "type": "Catalog",
        "stac_version": STAC_VERSION,
        "id": "test-catalog",
        "description": "test catalog",
        "links": links,
    }


def _provider(role: str) -> dict:
    return {"name": f"Test {role}", "roles": [role]}


def minimal_collection(links: list[dict], **overrides) -> dict:
    """LINZ-profile-valid minimal collection, mirroring the reference's
    MINIMAL_VALID_STAC_COLLECTION_OBJECT (tests/stac_objects.py:76-106):
    core keys plus every LINZ-required property."""
    doc = {
        "type": "Collection",
        "stac_version": STAC_VERSION,
        "id": "test-collection",
        "description": "test collection",
        "title": "Test_Collection",
        "license": "CC-BY-4.0",
        "extent": {
            "spatial": {"bbox": [[-180, -90, 180, 90]]},
            "temporal": {"interval": [["2021-01-01T00:00:00Z", None]]},
        },
        "providers": [_provider("licensor"), _provider("producer")],
        "version": "1.0.0",
        "linz:asset_summaries": {
            "created": {
                "minimum": "2021-01-01T00:00:00Z",
                "maximum": "2021-01-02T00:00:00Z",
            },
            "updated": {
                "minimum": "2021-01-01T00:00:00Z",
                "maximum": "2021-01-02T00:00:00Z",
            },
        },
        "linz:geospatial_type": "grid",
        "linz:history": "Created for engine tests",
        "linz:lifecycle": "completed",
        "linz:providers": [_provider("custodian"), _provider("manager")],
        "linz:security_classification": "unclassified",
        "links": links,
    }
    doc.update(overrides)
    return doc


def minimal_item(assets: dict, links: list[dict], **overrides) -> dict:
    doc = {
        "type": "Feature",
        "stac_version": STAC_VERSION,
        "id": "test-item",
        "geometry": None,
        "properties": {"datetime": "2021-01-01T00:00:00Z", "version": "1.0.0"},
        "assets": assets,
        "links": links,
    }
    doc.update(overrides)
    return doc


def build_golden_tree(root: str, asset_payloads: dict[str, bytes] | None = None) -> dict:
    """Write a valid 3-doc tree + asset files under ``root``/staging.
    Returns paths: {root_url, catalog, collection, item, assets: {name: path}}.
    """
    staging = os.path.join(root, "staging")
    payloads = asset_payloads or {
        "data1.bin": b"geostore asset payload one",
        "data2.bin": b"geostore asset payload two",
    }
    asset_paths = {}
    assets_block = {}
    for i, (name, payload) in enumerate(sorted(payloads.items())):
        path = os.path.join(staging, name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(payload)
        asset_paths[name] = path
        # first asset linked ./-relative, others absolute — exercises the
        # href resolution of check_stac_metadata/utils.py:59-67
        href = f"./{name}" if i == 0 else path
        assets_block[f"asset{i}"] = {
            "href": href,
            "file:checksum": sha256_multihash(payload),
            # LINZ profile: every asset carries created/updated
            "created": "2021-01-01T00:00:00Z",
            "updated": "2021-01-02T00:00:00Z",
        }

    item_path = os.path.join(staging, "item.json")
    collection_path = os.path.join(staging, "collection.json")
    catalog_path = os.path.join(staging, "catalog.json")

    _write_json(
        item_path,
        minimal_item(
            assets_block,
            links=[
                {"rel": "self", "href": item_path},
                {"rel": "parent", "href": "./collection.json"},
                # rel=root must be RETARGETED to ../catalog.json on import
                # (reference import_metadata_file/task.py:71-74), not just
                # basenamed like every other link
                {"rel": "root", "href": "./catalog.json"},
            ],
        ),
    )
    _write_json(
        collection_path,
        minimal_collection(
            links=[
                {"rel": "item", "href": "./item.json"},
                # revisited URL: second link to the same item → must be
                # traversed/validated exactly once (cycle safety, V1)
                {"rel": "item", "href": item_path},
                {"rel": "self", "href": collection_path},
            ]
        ),
    )
    _write_json(
        catalog_path,
        minimal_catalog(links=[{"rel": "child", "href": "./collection.json"}]),
    )
    return {
        "root_url": catalog_path,
        "catalog": catalog_path,
        "collection": collection_path,
        "item": item_path,
        "assets": asset_paths,
        "staging": staging,
    }
