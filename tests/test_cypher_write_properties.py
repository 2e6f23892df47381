"""Differential fuzz for the WRITE surface (r12 judge directive #6):
random upsert statements (MERGE + ON CREATE SET / ON MATCH SET / plain
SET / stored-property arithmetic / REMOVE) over random parameter
sequences, executed through THREE independent lanes:

1. the Cypher write compiler (`cypher_write` — the r11 upsert arms);
2. a hand-lowered :meth:`Warehouse.merge_into` per statement (this
   test's OWN lowering onto the conditional arms, not cypher.py's);
3. a pure-Python dict model of Neo4j's documented clause semantics
   (ON CREATE / ON MATCH by row fate, REMOVE nulls, ``null + n =
   null`` arithmetic — Cypher and SQL agree).

Any divergence is a real bug in one lane.  The read surface has had
this treatment since r4 (`test_cypher_vs_native_properties.py`); the
write arms were example-tested only.

DOCUMENTED ENGINE RESTRICTION the generator respects (and a pinned
test asserts): a property may be assigned by only ONE clause group
(plain SET xor ON CREATE/ON MATCH xor REMOVE) per statement.  The
engine evaluates every RHS against the OLD row (SQL UPDATE semantics)
and REJECTS cross-group duplicates with a clear ValueError — real
Neo4j instead composes clauses sequentially in textual order.  The
first fuzz run found exactly this edge (`cypher.py` `_merge_arms`
conflict check); loud refusal, never a silent wrong answer.
"""

from __future__ import annotations

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from binaryx_graph_spark.cypher import cypher_write
from binaryx_graph_spark.sources.warehouse import Warehouse

UIDS = ["a", "b", "c"]  # small universe → dense create/match collisions
NAMES = ["n1", "n2"]
TYPES = ["T1", "T2"]


@st.composite
def statements(draw):
    """One random upsert statement + its params: a merge on uid with
    random optional arms.  Each property is OWNED by exactly one
    clause group per statement (the engine's documented restriction;
    the same prop in BOTH conditional arms is legal — that is the
    counter idiom).  ``size`` additionally exercises the plain-literal
    / stored-property-counter / REMOVE lanes."""
    uid = draw(st.sampled_from(UIDS))
    on_create: dict = {}
    on_match: dict = {}
    plain: dict = {}
    for prop, vals in (("name", NAMES), ("type", TYPES)):
        owner = draw(st.sampled_from(["none", "arms", "plain"]))
        if owner == "plain":
            plain[prop] = draw(st.sampled_from(vals))
        elif owner == "arms":
            if draw(st.booleans()):
                on_create[prop] = draw(st.sampled_from(vals))
            if draw(st.booleans()):
                on_match[prop] = draw(st.sampled_from(vals))
    size_owner = draw(
        st.sampled_from(["none", "arms", "literal", "counter", "remove"])
    )
    size_val = draw(st.integers(0, 9))
    if size_owner == "arms":
        if draw(st.booleans()):
            on_create["size"] = draw(st.integers(0, 9))
        if draw(st.booleans()):
            on_match["size"] = draw(st.integers(0, 9))
    return {
        "uid": uid,
        "on_create": on_create or None,
        "on_match": on_match or None,
        "plain": plain or None,
        "size_mode": size_owner if size_owner in ("literal", "counter") else "none",
        "size_val": size_val,
        "remove_size": size_owner == "remove",
    }


def _cypher_text(s):
    parts = ["MERGE (f:Function {uid: $uid})"]
    if s["on_create"]:
        sets = ", ".join(f"f.{k} = ${k}_c" for k in sorted(s["on_create"]))
        parts.append(f"ON CREATE SET {sets}")
    if s["on_match"]:
        sets = ", ".join(f"f.{k} = ${k}_m" for k in sorted(s["on_match"]))
        parts.append(f"ON MATCH SET {sets}")
    plain_sets = []
    if s["plain"]:
        plain_sets += [f"f.{k} = ${k}_p" for k in sorted(s["plain"])]
    if s["size_mode"] == "literal":
        plain_sets.append("f.size = $size_p")
    elif s["size_mode"] == "counter":
        plain_sets.append("f.size = f.size + $size_p")
    if plain_sets:
        parts.append("SET " + ", ".join(plain_sets))
    if s["remove_size"]:
        parts.append("REMOVE f.size")
    return "\n".join(parts)


def _params(s):
    p = {"uid": s["uid"]}
    for k, v in (s["on_create"] or {}).items():
        p[f"{k}_c"] = v
    for k, v in (s["on_match"] or {}).items():
        p[f"{k}_m"] = v
    for k, v in (s["plain"] or {}).items():
        p[f"{k}_p"] = v
    if s["size_mode"] in ("literal", "counter"):
        p["size_p"] = s["size_val"]
    return p


# ------------------------------------------------------- model (lane 3)

PROPS = ("name", "size", "type")


def _model_apply(store, s):
    uid = s["uid"]
    created = uid not in store
    row = store.setdefault(uid, {"name": None, "size": None, "type": None})
    arm = s["on_create"] if created else s["on_match"]
    for k, v in (arm or {}).items():
        row[k] = v
    for k, v in (s["plain"] or {}).items():
        row[k] = v
    if s["size_mode"] == "literal":
        row["size"] = s["size_val"]
    elif s["size_mode"] == "counter":
        # Cypher: null + n = null (SQL agrees)
        row["size"] = None if row["size"] is None else row["size"] + s["size_val"]
    if s["remove_size"]:
        row["size"] = None


# --------------------------------------- hand merge_into lowering (lane 2)


def _merge_apply(spark, wh, s):
    """This test's OWN lowering of the statement onto merge_into's
    conditional arms: the source row carries the INSERT image in
    target-named columns plus u_-prefixed match-side values; the
    update dict lists exactly the match-modified columns."""
    ins = {"name": None, "size": None, "type": None}
    for k, v in (s["on_create"] or {}).items():
        ins[k] = v
    for k, v in (s["plain"] or {}).items():
        ins[k] = v
    if s["size_mode"] == "literal":
        ins["size"] = s["size_val"]
    elif s["size_mode"] == "counter":
        ins["size"] = None  # create fate: stored size is null → null
    if s["remove_size"]:
        ins["size"] = None

    upd: dict = {}
    for k, v in (s["on_match"] or {}).items():
        upd[k] = F.lit(v)
    for k, v in (s["plain"] or {}).items():
        upd[k] = F.lit(v)
    if s["size_mode"] == "literal":
        upd["size"] = F.lit(s["size_val"])
    elif s["size_mode"] == "counter":
        upd["size"] = F.col("t.size") + F.lit(s["size_val"])
    if s["remove_size"]:
        upd["size"] = F.lit(None).cast("long")

    src = spark.createDataFrame(
        [(s["uid"], ins["name"], ins["size"], ins["type"], "")],
        "uid string, name string, size long, type string, address string",
    )
    wh.merge_into(
        "functions",
        src,
        when_matched_update=upd if upd else None,
        when_not_matched_insert=True,
    )


def _rows(wh):
    return sorted(
        (r["uid"], r["name"], r["size"], r["type"])
        for r in wh.read("functions").collect()
    )


@given(st.lists(statements(), min_size=2, max_size=4))
@settings(max_examples=10, deadline=None)
def test_cypher_write_eq_merge_into_eq_model(spark, tmp_path_factory, stmts):
    base = tmp_path_factory.mktemp("wfuzz")
    wh_cy = Warehouse(spark, str(base / "cy"))
    wh_mi = Warehouse(spark, str(base / "mi"))
    for w in (wh_cy, wh_mi):
        w.initialize()
    store: dict = {}
    for s in stmts:
        cypher_write(wh_cy, _cypher_text(s), params=_params(s))
        _merge_apply(spark, wh_mi, s)
        _model_apply(store, s)
    want = sorted(
        (uid, r["name"], r["size"], r["type"]) for uid, r in store.items()
    )
    got_cy = _rows(wh_cy)
    got_mi = _rows(wh_mi)
    assert got_cy == want, f"cypher lane diverged:\n{got_cy}\nvs\n{want}"
    assert got_mi == want, f"merge_into lane diverged:\n{got_mi}\nvs\n{want}"


def test_cross_group_duplicate_assignment_refused(spark, tmp_path_factory):
    """The documented restriction the fuzz respects: one property
    assigned by two clause groups raises loudly (never a silent wrong
    answer).  Real Neo4j composes clauses sequentially — if the engine
    ever implements that, this pin flips to an equivalence test."""
    import pytest as _pytest

    wh = Warehouse(
        spark, str(tmp_path_factory.mktemp("wfuzz_pin") / "wh")
    )
    wh.initialize()
    with _pytest.raises(ValueError, match="assigned in both"):
        cypher_write(
            wh,
            "MERGE (f:Function {uid: $uid}) "
            "ON CREATE SET f.size = 0 SET f.size = f.size + 1",
            params={"uid": "x"},
        )
