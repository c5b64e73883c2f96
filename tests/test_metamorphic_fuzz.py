"""Pinned metamorphic-property seeds over the §2.7 curation operators.

`tools/metamorphic_fuzz.py` checks algebraic identities (dedup
idempotence, permutation invariance, near-dedup fixpoint, split
content-keying/subset stability, registry order invariance) on seeded
random corpora with controlled duplicate structure; round 15 extended it
to the ANN/similarity family (P10-P13: SRP content function, multi-probe
determinism/degeneracy/monotonicity, exhaustive-probe == brute force,
IVF assignment invariance) over a seeded vector corpus with exact
duplicate vectors, then to the graph kernel (P14: exact labeling on
known-structure random graphs incl. a star-fallback-forcing long path,
order/direction invariance, star agreement) and the BPE family (P15:
trainer order invariance + tier equality, encoder content function,
merge-prefix monotonicity). The CLI runs
open-ended sweeps (recorded in PLANS_r14.md); this block FREEZES a seed
range so CI is deterministic — a failure here is a real operator
property violation (or a generator-determinism regression), never fuzz
noise.

Seed-0 history: the first sweep flagged P4 at seed 0 — a harness
alignment artifact (NULL doc_id passes the subset filter but cannot
survive the id semi-join), fixed in the property, kept pinned.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import metamorphic_fuzz as mf  # noqa: E402

SEEDS = range(4)


def test_corpus_generator_is_deterministic():
    assert mf.gen_corpus(7) == mf.gen_corpus(7)
    assert mf.gen_corpus(7) != mf.gen_corpus(8)


def test_vector_generator_is_deterministic_with_duplicates():
    rows = mf.gen_vectors(5)
    assert rows == mf.gen_vectors(5)
    assert rows != mf.gen_vectors(6)
    vecs = [tuple(v) for (_, v) in rows]
    assert len(vecs) != len(set(vecs)), "no duplicate vectors generated"
    assert all(v is not None for (_, v) in rows), "NULLs excluded by design"


def test_corpus_has_the_structures_the_properties_need():
    rows = mf.gen_corpus(3)
    texts = [t for (_, t, _, _) in rows if t is not None]
    assert len(texts) != len(set(texts)), "no exact duplicates generated"
    assert any(t is None for (_, t, _, _) in rows), "no NULL-text rows"
    assert any(i is None for (i, _, _, _) in rows), "no NULL-id row"


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("prop", mf.PROPERTIES, ids=lambda p: p.__name__)
def test_property_holds(spark, seed, prop):
    msg = prop(spark, seed)
    assert msg is None, msg
