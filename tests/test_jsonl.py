"""JSONL(.gz) source/sink: shard round trip, gzip sniffing, column
pruning, distributed ingestion, and an operator-on-jsonl E2E."""

from __future__ import annotations

import gzip
import json
import os

import numpy as np
import pyarrow as pa
import pytest

from maup_ray.sources import jsonl_dataset, read_jsonl, write_jsonl


def _shard(rows, compress=False) -> bytes:
    payload = "\n".join(json.dumps(r) for r in rows).encode()
    return gzip.compress(payload) if compress else payload


class TestReadJsonl:
    def test_plain_and_gzip_identical(self):
        rows = [
            {"doc_id": 1, "text": "hello world", "score": 0.5, "ok": True},
            {"doc_id": 2, "text": "bye", "score": 1.25, "ok": False},
        ]
        a = read_jsonl(_shard(rows))
        b = read_jsonl(_shard(rows, compress=True))
        assert a.equals(b)
        assert a.schema.field("doc_id").type == pa.int64()
        assert a.schema.field("score").type == pa.float64()
        assert a.schema.field("ok").type == pa.bool_()
        assert a["text"].to_pylist() == ["hello world", "bye"]

    def test_missing_keys_are_null_and_columns_prune(self):
        rows = [{"a": 1, "b": "x"}, {"a": 2}, {"b": "z", "c": 9}]
        t = read_jsonl(_shard(rows))
        assert t["b"].to_pylist() == ["x", None, "z"]
        pruned = read_jsonl(_shard(rows), columns=["a"])
        assert pruned.column_names == ["a"]
        assert pruned["a"].to_pylist() == [1, 2, None]

    def test_nested_values_reserialize(self):
        rows = [{"id": 1, "meta": {"k": [1, 2]}}]
        t = read_jsonl(_shard(rows))
        assert json.loads(t["meta"][0].as_py()) == {"k": [1, 2]}

    def test_int_then_float_column_is_first_observed_type(self):
        # by-first-value typing is documented; ints after a float
        # coerce to float64
        rows = [{"v": 1.5}, {"v": 2}]
        t = read_jsonl(_shard(rows))
        assert t.schema.field("v").type == pa.float64()
        assert t["v"].to_pylist() == [1.5, 2.0]


class TestJsonlRoundTrip:
    def test_distributed_round_trip(self, ray_session, tmp_path):
        import ray.data

        n = 200
        tbl = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array([f"doc {i} text" for i in range(n)]),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        manifest = write_jsonl(ds, str(tmp_path / "shards"))
        assert manifest["rows"].sum() == n
        paths = sorted(
            str(tmp_path / "shards" / f)
            for f in os.listdir(tmp_path / "shards")
        )
        assert all(p.endswith(".jsonl.gz") for p in paths)
        back = jsonl_dataset(paths).to_pandas().sort_values("doc_id")
        assert list(back["doc_id"]) == list(range(n))
        assert list(back["text"]) == [f"doc {i} text" for i in range(n)]

    def test_operator_on_jsonl_corpus(self, ray_session, tmp_path):
        """Engine ops run on a JSONL corpus unchanged: token_count
        over gzip shards."""
        import ray.data

        from maup_ray.text.analysis import token_count_batch

        shards = []
        for s in range(3):
            rows = [
                {"doc_id": s * 10 + i, "text": "a b c"[: 1 + 2 * (i % 3)]}
                for i in range(10)
            ]
            p = tmp_path / f"s{s}.jsonl.gz"
            p.write_bytes(_shard(rows, compress=True))
            shards.append(str(p))
        ds = jsonl_dataset(shards, columns=["doc_id", "text"])
        out = ds.map_batches(
            token_count_batch, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        assert len(out) == 30
        assert set(out["n_tokens"]) == {1, 2, 3}

    def test_int_then_float_upgrades(self):
        rows = [{"v": 1}, {"v": 2.5}]
        t = read_jsonl(_shard(rows))
        assert t.schema.field("v").type == pa.float64()
        assert t["v"].to_pylist() == [1.0, 2.5]


class TestMixedTypeDegradation:
    def test_int_then_string_column_degrades_to_string(self):
        # ADVICE r3: real JSONL corpora mix types in one key; the
        # shard must parse (degrade to string) instead of raising
        t = read_jsonl(_shard([{"a": 1}, {"a": "x"}, {"a": None}]))
        assert t.schema.field("a").type == pa.string()
        assert t["a"].to_pylist() == ["1", "x", None]

    def test_bool_then_string_degrades(self):
        t = read_jsonl(_shard([{"a": True}, {"a": "x"}]))
        assert t["a"].to_pylist() == ["true", "x"]

    def test_int_float_string_mix_degrades(self):
        t = read_jsonl(_shard([{"a": 1}, {"a": 1.5}, {"a": "x"}]))
        assert t.schema.field("a").type == pa.string()

    def test_empty_shard_unifies_with_typed_blocks(
        self, ray_session, tmp_path
    ):
        # an all-empty shard must not pin an all-string schema that
        # conflicts with typed blocks from other shards
        p1 = os.path.join(tmp_path, "a.jsonl")
        p2 = os.path.join(tmp_path, "b.jsonl")
        with open(p1, "w") as f:
            f.write('{"k": 1, "v": 2.5}\n{"k": 2, "v": 3.5}\n')
        with open(p2, "w") as f:
            f.write("\n")  # empty shard
        ds = jsonl_dataset([p1, p2], columns=["k", "v"])
        df = ds.to_pandas().sort_values("k").reset_index(drop=True)
        assert df["k"].tolist() == [1, 2]
        assert df["v"].tolist() == [2.5, 3.5]
