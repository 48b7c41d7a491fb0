"""Randomized differential testing of the dynamic-JSON FAST PATH: random
flat-ish schemas x random JSON instance strings, FastJsonColumnValidator
batch output vs the pure-oracle JsonColumnValidator. Seeded, deterministic,
no Ray session needed (the validators are plain batch callables)."""

import json
import random

import pyarrow as pa
import pytest

from engine.dataset import FastJsonColumnValidator, JsonColumnValidator


def rand_flat_schema(rng: random.Random) -> str:
    props = {}
    required = []
    for i in range(rng.randint(0, 5)):
        name = f"p{i}"
        r = rng.random()
        if r < 0.25:
            sub = {"type": "integer"}
            if rng.random() < 0.7:
                sub["minimum"] = rng.choice([-5, 0, 3])
            if rng.random() < 0.7:
                sub["maximum"] = rng.choice([2, 10, 50])
        elif r < 0.45:
            sub = {"type": "string"}
            if rng.random() < 0.5:
                sub["minLength"] = rng.randint(0, 3)
            if rng.random() < 0.5:
                sub["maxLength"] = rng.randint(1, 6)
            if rng.random() < 0.4:
                sub["pattern"] = rng.choice(["^[a-z]+$", "x", "[0-9]$"])
        elif r < 0.55:
            sub = {"type": "number", "minimum": -1.5}
        elif r < 0.65:
            sub = {"type": "boolean"}
        elif r < 0.75:
            sub = {"enum": rng.sample([1, "a", "b", 2.5, True, None], 3)}
        elif r < 0.85:
            sub = {"const": rng.choice([3, "z", False, 1.5])}
        else:  # deep feature -> per-row oracle fallback must engage
            sub = rng.choice([
                {"type": "object", "required": ["q"]},
                {"type": "array", "items": {"type": "integer"}},
                {"anyOf": [{"type": "integer"}, {"type": "string"}]},
            ])
        props[name] = sub
        if rng.random() < 0.4:
            required.append(name)
    schema: dict = {"type": "object", "properties": props}
    if required:
        schema["required"] = required
    if rng.random() < 0.4:
        schema["additionalProperties"] = False
    return json.dumps(schema)


def rand_instance(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.05:
        return "not-json{{{"
    if r < 0.10:
        return rng.choice(["3", "3.5", '"s"', "true", "null", "[1,2]"])
    inst = {}
    pool = [0, -7, 3, 51, 2.5, -3.5, True, False, None, "", "ab", "xyz9",
            "ABC", [1, 2], {"q": 1}, {}, 2**70, 1.0]
    for i in range(6):
        if rng.random() < 0.6:
            inst[f"p{i}" if i < 5 else "extra"] = rng.choice(pool)
    return json.dumps(inst)


@pytest.mark.parametrize("seed", range(60))
def test_fast_json_path_matches_oracle(seed):
    rng = random.Random(seed)
    schema_json = rand_flat_schema(rng)
    rows = [rand_instance(rng) for _ in range(40)]
    if rng.random() < 0.3:
        rows.append(None)
    batch = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "props": pa.array(rows, pa.string())})
    fast = FastJsonColumnValidator(schema_json, "props", "event_id")(batch)
    slow = JsonColumnValidator(schema_json, "props", "event_id")(batch)
    assert fast.to_pylist() == slow.to_pylist(), schema_json
