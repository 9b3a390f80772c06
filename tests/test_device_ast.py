"""Boolean-AST device evaluation: whole trees as one compiled bitmap
program + the vectorized exact-text post-filter (verdict r2 item 7 — the
host path materialized every clause's full id set)."""

import numpy as np
import pytest

from mygramdb_tpu.catalog import TableCatalog
from mygramdb_tpu.config import load_config_from_dict
from mygramdb_tpu.query import QueryParser
from mygramdb_tpu.query.pipeline import SearchPipeline

CFG = {
    "tables": [{"name": "t", "text_source": {"column": "c"}}],
    "memory": {"verify_text": "all"},
    "cache": {"enabled": False},
}

WORDS = ["alpha", "beta", "gamma", "delta", "日本語", "検索"]


@pytest.fixture(scope="module")
def engine():
    cfg = load_config_from_dict(CFG)
    cat = TableCatalog(cfg)
    ctx = cat.resolve("t")
    rng = np.random.default_rng(3)
    docs = {}
    for i in range(1, 801):
        t = " ".join(rng.choice(WORDS, size=int(rng.integers(2, 6))))
        docs[i] = t
        ctx.add_row(str(i), t, None)
    ctx.optimize()
    return SearchPipeline(ctx, cfg), ctx, docs


P = QueryParser()

CASES = [
    ('((alpha OR beta) AND gamma)',
     lambda t: ("alpha" in t or "beta" in t) and "gamma" in t),
    ('(alpha AND NOT beta)', lambda t: "alpha" in t and "beta" not in t),
    ('(NOT alpha)', lambda t: "alpha" not in t),
    ('(alpha OR zzznope)', lambda t: "alpha" in t),
    ('((alpha OR 日本語) AND NOT (beta AND gamma))',
     lambda t: ("alpha" in t or "日本語" in t)
     and not ("beta" in t and "gamma" in t)),
]


class TestDeviceAST:
    @pytest.mark.parametrize("expr,pred", CASES)
    def test_parity_and_path(self, engine, expr, pred):
        pipe, ctx, docs = engine
        out = pipe.execute(P.parse(f"SEARCH t {expr} LIMIT 2000"),
                           want_debug=True)
        assert out.success, out.error
        # steady state (no delta) must take the device bitmap program
        assert out.debug.optimization_used == "device_ast"
        exp = sorted((d for d, t in docs.items() if pred(t)), reverse=True)
        assert out.total == len(exp), expr
        assert out.results.tolist() == exp[:2000], expr

    def test_delta_falls_back_to_host(self, engine):
        pipe, ctx, docs = engine
        ctx.add_row("9001", "alpha beta fresh", None)
        try:
            out = pipe.execute(P.parse('SEARCH t (alpha AND beta) LIMIT 9999'),
                               want_debug=True)
            assert out.success
            assert out.debug.optimization_used != "device_ast"
            new_doc = ctx.doc_store.doc_id("9001")
            assert new_doc in out.results.tolist()
        finally:
            ctx.remove_row("9001")
            ctx.optimize()

    def test_short_term_falls_back(self, engine):
        pipe, ctx, docs = engine
        # 1-char ascii term has no grams -> host substring path
        out = pipe.execute(P.parse('SEARCH t (alpha AND l) LIMIT 2000'),
                           want_debug=True)
        assert out.success
        assert out.debug.optimization_used != "device_ast"
        exp = sorted((d for d, t in docs.items()
                      if "alpha" in t and "l" in t), reverse=True)
        assert out.results.tolist() == exp[:2000]
