"""Vendored Draft-7 STAC JSON Schemas with a ``$ref``-resolving store.

Mirrors the reference's full-fidelity validator construction
(``geostore/check_stac_metadata/stac_validators.py:37-103``): a schema
store keyed by normalized ``$id`` URI, per-STAC-type validators built
over that store, extension schemas versioned under ``vX.Y.Z`` with a
semver latest-version pick (``stac_validators.py:37-44``).

The reference vendors the upstream schema files as git submodules; this
module re-states the same public schemas (STAC 1.0.0 core spec,
stac-extensions file/projection/version, GeoJSON) as Python dicts so the
store ships inside the package and resolves entirely offline on Spark
executors. Content follows the published spec: catalog/collection/item
core objects, the item ``geometry ⇒ bbox`` conditional, 4-or-6-arity
bboxes, RFC 3339 datetimes, link/asset object shapes, and the
file/projection/version extension property constraints.

Deliberate deltas from upstream (documented, not accidental):
- ``format: date-time`` is backed by an RFC 3339 regex ``pattern`` so
  validation does not depend on the optional ``rfc3339-validator``
  package being installed on executors.
- Free-text annotation keywords (``title``/``description`` of schema
  nodes) are dropped; they carry no validation semantics.
"""

from __future__ import annotations

from functools import lru_cache

from jsonschema import Draft7Validator, FormatChecker
from referencing import Registry, Resource
from referencing.jsonschema import DRAFT7

STAC_SPEC_VERSION = "1.0.0"
_CORE = f"https://schemas.stacspec.org/v{STAC_SPEC_VERSION}"
_EXT = "https://stac-extensions.github.io"

# RFC 3339 date-time (the shape STAC mandates: UTC offset or Z).
RFC3339_PATTERN = (
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})$"
)

_DATETIME_OR_NULL = {
    "oneOf": [
        {"type": "string", "pattern": RFC3339_PATTERN},
        {"type": "null"},
    ]
}
_DATETIME = {"type": "string", "pattern": RFC3339_PATTERN}

# 2D or 3D bounding box: exactly 4 or exactly 6 numbers.
_BBOX = {
    "type": "array",
    "items": {"type": "number"},
    "oneOf": [
        {"minItems": 4, "maxItems": 4},
        {"minItems": 6, "maxItems": 6},
    ],
}

_LINK = {
    "type": "object",
    "required": ["rel", "href"],
    "properties": {
        "href": {"type": "string", "minLength": 1},
        "rel": {"type": "string", "minLength": 1},
        "type": {"type": "string"},
        "title": {"type": "string"},
    },
}

_LINKS = {"type": "array", "items": _LINK}

_ASSET = {
    "type": "object",
    "required": ["href"],
    "properties": {
        "href": {"type": "string", "minLength": 1},
        "title": {"type": "string"},
        "description": {"type": "string"},
        "type": {"type": "string"},
        "roles": {"type": "array", "items": {"type": "string"}},
    },
}

_ASSETS = {"type": "object", "additionalProperties": _ASSET}

_STAC_VERSION_FIELD = {"type": "string", "const": STAC_SPEC_VERSION}
_STAC_EXTENSIONS_FIELD = {
    "type": "array",
    "items": {"type": "string", "format": "iri"},
}

# --- GeoJSON (https://geojson.org/schema) ----------------------------------

_POSITION = {"type": "array", "minItems": 2, "items": {"type": "number"}}
_LINEAR_RING = {"type": "array", "minItems": 4, "items": _POSITION}

GEOMETRY_SCHEMA = {
    "$id": "https://geojson.org/schema/Geometry.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "oneOf": [
        {
            "type": "object",
            "required": ["type", "coordinates"],
            "properties": {
                "type": {"const": "Point"},
                "coordinates": _POSITION,
            },
        },
        {
            "type": "object",
            "required": ["type", "coordinates"],
            "properties": {
                "type": {"const": "MultiPoint"},
                "coordinates": {"type": "array", "items": _POSITION},
            },
        },
        {
            "type": "object",
            "required": ["type", "coordinates"],
            "properties": {
                "type": {"const": "LineString"},
                "coordinates": {"type": "array", "minItems": 2, "items": _POSITION},
            },
        },
        {
            "type": "object",
            "required": ["type", "coordinates"],
            "properties": {
                "type": {"const": "MultiLineString"},
                "coordinates": {
                    "type": "array",
                    "items": {"type": "array", "minItems": 2, "items": _POSITION},
                },
            },
        },
        {
            "type": "object",
            "required": ["type", "coordinates"],
            "properties": {
                "type": {"const": "Polygon"},
                "coordinates": {"type": "array", "items": _LINEAR_RING},
            },
        },
        {
            "type": "object",
            "required": ["type", "coordinates"],
            "properties": {
                "type": {"const": "MultiPolygon"},
                "coordinates": {
                    "type": "array",
                    "items": {"type": "array", "items": _LINEAR_RING},
                },
            },
        },
        {
            "type": "object",
            "required": ["type", "geometries"],
            "properties": {
                "type": {"const": "GeometryCollection"},
                "geometries": {
                    "type": "array",
                    "items": {"$ref": "https://geojson.org/schema/Geometry.json"},
                },
            },
        },
    ],
}

FEATURE_SCHEMA = {
    "$id": "https://geojson.org/schema/Feature.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["type", "properties", "geometry"],
    "properties": {
        "type": {"const": "Feature"},
        "geometry": {
            "oneOf": [
                {"type": "null"},
                {"$ref": "https://geojson.org/schema/Geometry.json"},
            ]
        },
        "properties": {"oneOf": [{"type": "null"}, {"type": "object"}]},
        "bbox": _BBOX,
    },
}

# --- STAC core: item-spec shared fragments ---------------------------------

BASICS_SCHEMA = {
    "$id": f"{_CORE}/item-spec/json-schema/basics.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "properties": {
        "title": {"type": "string"},
        "description": {"type": "string"},
    },
}

DATETIME_SCHEMA = {
    "$id": f"{_CORE}/item-spec/json-schema/datetime.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["datetime"],
    "properties": {
        "datetime": _DATETIME_OR_NULL,
        "start_datetime": _DATETIME,
        "end_datetime": _DATETIME,
        "created": _DATETIME,
        "updated": _DATETIME,
    },
    # null datetime is only allowed when a start/end range is given
    "if": {"properties": {"datetime": {"const": None}}},
    "then": {"required": ["start_datetime", "end_datetime"]},
}

INSTRUMENT_SCHEMA = {
    "$id": f"{_CORE}/item-spec/json-schema/instrument.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "properties": {
        "platform": {"type": "string"},
        "instruments": {"type": "array", "items": {"type": "string"}},
        "constellation": {"type": "string"},
        "mission": {"type": "string"},
        "gsd": {"type": "number", "exclusiveMinimum": 0},
    },
}

LICENSING_SCHEMA = {
    "$id": f"{_CORE}/item-spec/json-schema/licensing.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "properties": {"license": {"type": "string", "pattern": "^[\\w\\-\\.\\+]+$"}},
}

PROVIDER_SCHEMA = {
    "$id": f"{_CORE}/item-spec/json-schema/provider.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "properties": {
        "providers": {
            "type": "array",
            "items": {
                "type": "object",
                "required": ["name"],
                "properties": {
                    "name": {"type": "string", "minLength": 1},
                    "description": {"type": "string"},
                    "roles": {
                        "type": "array",
                        "items": {
                            "enum": ["producer", "licensor", "processor", "host"]
                        },
                    },
                    "url": {"type": "string", "format": "iri"},
                },
            },
        }
    },
}

# --- STAC core: item / catalog / collection --------------------------------

ITEM_SCHEMA = {
    "$id": f"{_CORE}/item-spec/json-schema/item.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "allOf": [
        {"$ref": "https://geojson.org/schema/Feature.json"},
        {
            "required": ["stac_version", "id", "links", "assets", "properties"],
            "properties": {
                "stac_version": _STAC_VERSION_FIELD,
                "stac_extensions": _STAC_EXTENSIONS_FIELD,
                "id": {"type": "string", "minLength": 1},
                "links": _LINKS,
                "assets": _ASSETS,
                "collection": {"type": "string", "minLength": 1},
                "properties": {
                    "allOf": [
                        {"$ref": f"{_CORE}/item-spec/json-schema/basics.json"},
                        {"$ref": f"{_CORE}/item-spec/json-schema/datetime.json"},
                        {"$ref": f"{_CORE}/item-spec/json-schema/instrument.json"},
                        {"$ref": f"{_CORE}/item-spec/json-schema/licensing.json"},
                        {"$ref": f"{_CORE}/item-spec/json-schema/provider.json"},
                    ]
                },
            },
        },
        # non-null geometry requires a bbox; null geometry forbids one
        {
            "if": {
                "properties": {"geometry": {"type": "object"}},
                "required": ["geometry"],
            },
            "then": {"required": ["bbox"]},
            "else": {"not": {"required": ["bbox"]}},
        },
    ],
}

CATALOG_SCHEMA = {
    "$id": f"{_CORE}/catalog-spec/json-schema/catalog.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["type", "stac_version", "id", "description", "links"],
    "properties": {
        "type": {"const": "Catalog"},
        "stac_version": _STAC_VERSION_FIELD,
        "stac_extensions": _STAC_EXTENSIONS_FIELD,
        "id": {"type": "string", "minLength": 1},
        "title": {"type": "string"},
        "description": {"type": "string", "minLength": 1},
        "links": _LINKS,
    },
}

COLLECTION_SCHEMA = {
    "$id": f"{_CORE}/collection-spec/json-schema/collection.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": [
        "type",
        "stac_version",
        "id",
        "description",
        "license",
        "extent",
        "links",
    ],
    "properties": {
        "type": {"const": "Collection"},
        "stac_version": _STAC_VERSION_FIELD,
        "stac_extensions": _STAC_EXTENSIONS_FIELD,
        "id": {"type": "string", "minLength": 1},
        "title": {"type": "string"},
        "description": {"type": "string", "minLength": 1},
        "keywords": {"type": "array", "items": {"type": "string"}},
        "license": {"type": "string", "pattern": "^[\\w\\-\\.\\+]+$"},
        "providers": {
            "$ref": f"{_CORE}/item-spec/json-schema/provider.json#/properties/providers"
        },
        "extent": {
            "type": "object",
            "required": ["spatial", "temporal"],
            "properties": {
                "spatial": {
                    "type": "object",
                    "required": ["bbox"],
                    "properties": {
                        "bbox": {"type": "array", "minItems": 1, "items": _BBOX}
                    },
                },
                "temporal": {
                    "type": "object",
                    "required": ["interval"],
                    "properties": {
                        "interval": {
                            "type": "array",
                            "minItems": 1,
                            "items": {
                                "type": "array",
                                "minItems": 2,
                                "maxItems": 2,
                                "items": _DATETIME_OR_NULL,
                            },
                        }
                    },
                },
            },
        },
        "summaries": {"type": "object"},
        "links": _LINKS,
        "assets": _ASSETS,
    },
}

# --- Extension schemas, versioned like the reference's vendored tree -------

FILE_V2_SCHEMA = {
    "$id": f"{_EXT}/file/v2.0.0/schema.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "allOf": [
        {
            "properties": {
                "assets": {
                    "type": "object",
                    "additionalProperties": {
                        "$ref": f"{_EXT}/file/v2.0.0/schema.json#/definitions/fields"
                    },
                },
                "links": {
                    "type": "array",
                    "items": {
                        "$ref": f"{_EXT}/file/v2.0.0/schema.json#/definitions/fields"
                    },
                },
            }
        }
    ],
    "definitions": {
        "fields": {
            "type": "object",
            "properties": {
                # multihash: hex digest with a multihash prefix
                "file:checksum": {"type": "string", "pattern": "^[a-f0-9]+$"},
                "file:size": {"type": "integer", "minimum": 0},
                "file:header_size": {"type": "integer", "minimum": 0},
                "file:byte_order": {"enum": ["big-endian", "little-endian"]},
            },
        }
    },
}

PROJECTION_V1_SCHEMA = {
    "$id": f"{_EXT}/projection/v1.0.0/schema.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "allOf": [
        {
            "if": {"properties": {"type": {"const": "Feature"}}},
            "then": {
                "properties": {
                    "properties": {
                        "type": "object",
                        "required": ["proj:epsg"],
                        "properties": {
                            "proj:epsg": {
                                "oneOf": [{"type": "integer"}, {"type": "null"}]
                            },
                            "proj:wkt2": {
                                "oneOf": [{"type": "string"}, {"type": "null"}]
                            },
                            "proj:bbox": _BBOX,
                            "proj:centroid": {
                                "type": "object",
                                "required": ["lat", "lon"],
                                "properties": {
                                    "lat": {"type": "number"},
                                    "lon": {"type": "number"},
                                },
                            },
                            "proj:shape": {
                                "type": "array",
                                "minItems": 2,
                                "maxItems": 2,
                                "items": {"type": "integer", "minimum": 1},
                            },
                        },
                    }
                }
            },
        }
    ],
}

VERSION_V1_SCHEMA = {
    "$id": f"{_EXT}/version/v1.0.0/schema.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "allOf": [
        {
            "if": {"properties": {"type": {"const": "Feature"}}},
            "then": {
                "properties": {
                    "properties": {
                        "type": "object",
                        "required": ["version"],
                        "properties": {
                            "version": {"type": "string", "minLength": 1},
                            "deprecated": {"type": "boolean"},
                        },
                    }
                }
            },
        },
        {
            "if": {"properties": {"type": {"const": "Collection"}}},
            "then": {
                "required": ["version"],
                "properties": {
                    "version": {"type": "string", "minLength": 1},
                    "deprecated": {"type": "boolean"},
                },
            },
        },
    ],
}

# Every vendored schema, keyed by its ``$id`` — the analog of the
# reference's ``schema_store`` loop (stac_validators.py:69-88).
# --- LINZ profile (https://stac.linz.govt.nz, linz/stac extension) ----------
#
# The reference validates Collections AND Items against the LINZ
# extension schema — not the bare core spec — via
# STAC_TYPE_VALIDATION_MAP (check_stac_metadata/utils.py:45-49;
# stac_validators.py:95-103 builds both validators over LINZ_SCHEMA,
# which allOf-refs the core type schema plus the LINZ required
# properties). The upstream file lives in the public linz/stac repo
# (vendored there as a git submodule, absent from this offline
# checkout); this restatement carries the documented requirements the
# reference's own minimal-valid fixtures witness
# (tests/stac_objects.py:76-132): every key whose removal makes the
# reference's validator fail is required here, with the enum domains
# from tests/stac_generators.py:85-121.

_LINZ_BASE = "https://stac.linz.govt.nz/v0.0.15"

_LINZ_PROVIDER = {
    "type": "object",
    "required": ["name", "roles"],
    "properties": {
        "name": {"type": "string", "minLength": 1},
        "description": {"type": "string"},
        "roles": {"type": "array", "items": {"type": "string"}},
        "url": {"type": "string"},
    },
}

def _provider_role_required(role: str) -> dict:
    return {
        "contains": {
            "type": "object",
            "properties": {"roles": {"contains": {"const": role}}},
            "required": ["roles"],
        }
    }

_LINZ_SUMMARY_RANGE = {
    "type": "object",
    "required": ["minimum", "maximum"],
    "properties": {"minimum": _DATETIME, "maximum": _DATETIME},
}

_LINZ_GEOSPATIAL_TYPES = [
    "black and white image", "circular string", "color image",
    "compound curve", "curve polygon", "geometry", "geometry collection",
    "grayscale", "grid", "hyperspectral", "multicurve", "multilinestring",
    "multipoint", "multipolygon", "multispectral", "multisurface",
    "linestring", "point", "point cloud", "polygon", "polyhedral surface",
    "rgb", "tin", "triangle",
]

_LINZ_ASSET = {
    "type": "object",
    "required": ["created", "updated"],
    "properties": {"created": _DATETIME, "updated": _DATETIME},
}

# Quality sub-schema — the second file the reference's schema store
# preloads alongside the LINZ profile
# (/root/reference/geostore/check_stac_metadata/stac_validators.py:64
# QUALITY_SCHEMA_PATH = "{version}/quality/schema.json", stored at :85).
# The upstream bytes live in the public linz/stac repo (an EMPTY git
# submodule in this checkout, like the main profile), so this is a
# reconstruction from the public linz/stac v0.0.15 spec: the quality
# extension's `quality:*` fields apply to Collection objects and Item
# ``properties``; each field is typed and accuracies are non-negative
# metres. A document carrying a mistyped or negative quality field must
# fail schema validation exactly as it would against the reference's
# preloaded store.
LINZ_QUALITY_SCHEMA = {
    "$id": f"{_LINZ_BASE}/quality/schema.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "definitions": {
        "fields": {
            "type": "object",
            "properties": {
                "quality:description": {"type": "string", "minLength": 1},
                "quality:lineage": {"type": "string", "minLength": 1},
                "quality:horizontal_accuracy": {
                    "type": "number",
                    "minimum": 0,
                },
                "quality:vertical_accuracy": {
                    "type": "number",
                    "minimum": 0,
                },
            },
        }
    },
}

_QUALITY_FIELDS_REF = {
    "$ref": f"{_LINZ_BASE}/quality/schema.json#/definitions/fields"
}

LINZ_COLLECTION_SCHEMA = {
    "$id": f"{_LINZ_BASE}/linz/collection.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "allOf": [
        {"$ref": f"{_CORE}/collection-spec/json-schema/collection.json"},
        # quality fields apply to the Collection object itself
        _QUALITY_FIELDS_REF,
        {
            "type": "object",
            "required": [
                "title",
                "providers",
                "version",
                "linz:asset_summaries",
                "linz:geospatial_type",
                "linz:history",
                "linz:lifecycle",
                "linz:providers",
                "linz:security_classification",
            ],
            "properties": {
                "providers": {
                    "type": "array",
                    "items": _LINZ_PROVIDER,
                    "allOf": [
                        _provider_role_required("licensor"),
                        _provider_role_required("producer"),
                    ],
                },
                "version": {"type": "string", "minLength": 1},
                "linz:asset_summaries": {
                    "type": "object",
                    "required": ["created", "updated"],
                    "properties": {
                        "created": _LINZ_SUMMARY_RANGE,
                        "updated": _LINZ_SUMMARY_RANGE,
                    },
                },
                "linz:geospatial_type": {"enum": _LINZ_GEOSPATIAL_TYPES},
                "linz:history": {"type": "string", "minLength": 1},
                "linz:lifecycle": {
                    "enum": [
                        "under development", "preview", "ongoing",
                        "completed", "deprecated",
                    ]
                },
                "linz:providers": {
                    "type": "array",
                    "items": _LINZ_PROVIDER,
                    "allOf": [
                        _provider_role_required("custodian"),
                        _provider_role_required("manager"),
                    ],
                },
                "linz:security_classification": {"type": "string", "minLength": 1},
                "assets": {"type": "object", "additionalProperties": _LINZ_ASSET},
            },
        },
    ],
}

LINZ_ITEM_SCHEMA = {
    "$id": f"{_LINZ_BASE}/linz/item.json",
    "$schema": "http://json-schema.org/draft-07/schema#",
    "allOf": [
        {"$ref": f"{_CORE}/item-spec/json-schema/item.json"},
        {
            "type": "object",
            "properties": {
                "properties": {
                    "type": "object",
                    "required": ["version"],
                    "properties": {"version": {"type": "string", "minLength": 1}},
                },
                "assets": {"type": "object", "additionalProperties": _LINZ_ASSET},
            },
        },
        # quality fields apply to Item properties
        {
            "type": "object",
            "properties": {"properties": _QUALITY_FIELDS_REF},
        },
    ],
}

SCHEMA_STORE: dict[str, dict] = {
    s["$id"]: s
    for s in [
        GEOMETRY_SCHEMA,
        FEATURE_SCHEMA,
        BASICS_SCHEMA,
        DATETIME_SCHEMA,
        INSTRUMENT_SCHEMA,
        LICENSING_SCHEMA,
        PROVIDER_SCHEMA,
        ITEM_SCHEMA,
        CATALOG_SCHEMA,
        COLLECTION_SCHEMA,
        FILE_V2_SCHEMA,
        PROJECTION_V1_SCHEMA,
        VERSION_V1_SCHEMA,
        LINZ_QUALITY_SCHEMA,
        LINZ_COLLECTION_SCHEMA,
        LINZ_ITEM_SCHEMA,
    ]
}

# Vendored extension versions, newest pickable by semver — the analog of
# get_latest_extension_schema_version (stac_validators.py:37-44).
EXTENSION_VERSIONS: dict[str, dict[str, str]] = {
    "file": {"2.0.0": FILE_V2_SCHEMA["$id"]},
    "projection": {"1.0.0": PROJECTION_V1_SCHEMA["$id"]},
    "version": {"1.0.0": VERSION_V1_SCHEMA["$id"]},
    "linz": {"0.0.15": LINZ_COLLECTION_SCHEMA["$id"]},
    "quality": {"0.0.15": LINZ_QUALITY_SCHEMA["$id"]},
}


def latest_extension_version(extension: str) -> str:
    """Highest vendored semver for ``extension`` (e.g. 'file' → '2.0.0')."""
    versions = EXTENSION_VERSIONS[extension]
    return max(versions, key=lambda v: tuple(int(p) for p in v.split(".")))


def latest_extension_uri(extension: str) -> str:
    return EXTENSION_VERSIONS[extension][latest_extension_version(extension)]


@lru_cache(maxsize=1)
def _registry() -> Registry:
    return Registry().with_resources(
        (uri, Resource.from_contents(schema, default_specification=DRAFT7))
        for uri, schema in SCHEMA_STORE.items()
    )


_TYPE_TO_CORE_URI = {
    "Catalog": CATALOG_SCHEMA["$id"],
    "Collection": COLLECTION_SCHEMA["$id"],
    "Feature": ITEM_SCHEMA["$id"],
}

_TYPE_TO_LINZ_URI = {
    "Collection": LINZ_COLLECTION_SCHEMA["$id"],
    "Feature": LINZ_ITEM_SCHEMA["$id"],
}


@lru_cache(maxsize=32)
def _validator_for(uri: str) -> Draft7Validator:
    return Draft7Validator(
        SCHEMA_STORE[uri], registry=_registry(), format_checker=FormatChecker()
    )


def validation_errors(doc: dict) -> list[str]:
    """Full-fidelity Draft-7 errors for one parsed STAC document.

    Core schema by ``type`` (STAC_TYPE_VALIDATION_MAP analog,
    check_stac_metadata/utils.py:45-49), then every declared
    ``stac_extensions`` URI that resolves in the vendored store (unknown
    URIs are skipped — the store is offline by design)."""
    doc_type = doc.get("type")
    core_uri = _TYPE_TO_CORE_URI.get(doc_type)
    if core_uri is None:
        return [f"Unknown STAC type: {doc_type!r}"]
    errors = [
        f"{'/'.join(str(p) for p in e.absolute_path) or '$'}: {e.message}"
        for e in _validator_for(core_uri).iter_errors(doc)
    ]
    # LINZ profile, UNCONDITIONALLY for Collections and Items — the
    # reference's STAC_TYPE_VALIDATION_MAP points those two types at the
    # LINZ schema, not the bare core spec (check_stac_metadata/
    # utils.py:45-49); catalogs stay core-only
    linz_uri = _TYPE_TO_LINZ_URI.get(doc_type)
    if linz_uri is not None:
        errors.extend(
            f"linz: {'/'.join(str(p) for p in e.absolute_path) or '$'}: "
            f"{e.message}"
            for e in _validator_for(linz_uri).iter_errors(doc)
        )
    for ext_uri in doc.get("stac_extensions") or []:
        if isinstance(ext_uri, str) and ext_uri in SCHEMA_STORE:
            errors.extend(
                f"{ext_uri.rsplit('/', 3)[-3]}: "
                f"{'/'.join(str(p) for p in e.absolute_path) or '$'}: {e.message}"
                for e in _validator_for(ext_uri).iter_errors(doc)
            )
    return errors
