"""Seeded structural fuzz: deep random schemas must never crash the
domain cores, must be self-compatible, and canonical forms must be
idempotent.  (This net caught a real stack overflow on recursive types.)
"""

from __future__ import annotations

import json
import random

from axonops_schema_registry_spark.registry.avro import (
    avro_canonical_form,
    avro_extract_fields,
)
from axonops_schema_registry_spark.registry.compat import check_pair

PRIMS = ["null", "boolean", "int", "long", "float", "double", "bytes",
         "string"]


def _rand_avro(rng: random.Random, ctr: list, depth: int = 0):
    ctr[0] += 1
    n = ctr[0]
    c = rng.random()
    if depth >= 3 or c < 0.35:
        return rng.choice(PRIMS)
    if c < 0.5:
        return {"type": "record", "name": f"Rec{n}", "fields": [
            {"name": f"f{i}", "type": _rand_avro(rng, ctr, depth + 1)}
            for i in range(rng.randint(1, 3))]}
    if c < 0.62:
        return {"type": "array", "items": _rand_avro(rng, ctr, depth + 1)}
    if c < 0.74:
        return {"type": "map", "values": _rand_avro(rng, ctr, depth + 1)}
    if c < 0.86:
        branches = ["null"] + [rng.choice(PRIMS)
                               for _ in range(rng.randint(1, 2))]
        uniq: list = []
        for b in branches:
            if b not in uniq:
                uniq.append(b)
        return uniq
    if c < 0.94:
        return {"type": "enum", "name": f"En{n}",
                "symbols": [f"S{i}" for i in range(rng.randint(1, 3))]}
    return {"type": "fixed", "name": f"Fx{n}", "size": rng.randint(1, 16)}


def _rand_json(rng: random.Random, depth: int = 0):
    c = rng.random()
    if depth >= 3 or c < 0.4:
        return {"type": rng.choice(["string", "integer", "number",
                                    "boolean"])}
    if c < 0.6:
        props = {f"p{i}": _rand_json(rng, depth + 1)
                 for i in range(rng.randint(1, 3))}
        req = [k for k in props if rng.random() < 0.5]
        return {"type": "object", "properties": props, "required": req}
    if c < 0.75:
        return {"type": "array", "items": _rand_json(rng, depth + 1)}
    if c < 0.9:
        return {"anyOf": [_rand_json(rng, depth + 1) for _ in range(2)]}
    return {"enum": [rng.randint(0, 5) for _ in range(3)]}


def test_avro_fuzz_self_compat_and_canonical_idempotence():
    rng = random.Random(20260813)
    ctr = [0]
    for _ in range(200):
        schema = {"type": "record", "name": "Top", "fields": [
            {"name": f"t{i}", "type": _rand_avro(rng, ctr)}
            for i in range(rng.randint(1, 4))]}
        text = json.dumps(schema)
        assert check_pair(text, text, "AVRO") == []
        canon = avro_canonical_form(text)
        assert avro_canonical_form(canon) == canon
        avro_extract_fields(text)  # must not raise


def test_json_fuzz_self_compat():
    rng = random.Random(20260813)
    for _ in range(200):
        text = json.dumps(_rand_json(rng))
        assert check_pair(text, text, "JSON") == []
