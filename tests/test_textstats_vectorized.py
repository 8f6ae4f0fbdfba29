"""Vectorized LangIdStage/QualityStage == the scalar reference loops
(round-4 verdict item #2). The scalar implementations stay in the module
as the executable spec; these tests pin the equivalence over adversarial
unicode, truncation boundaries, ties and nulls, plus a hypothesis fuzz."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from geomesa_nifi_ray.textstats import LangIdStage, QualityStage

ADVERSARIAL = [
    None,
    "",
    " ",
    "\t\n  \r ",
    "the and of to a in is that for it with was on",        # pure en stop
    "der die das und ist nicht ein mit für von auf zu",     # pure de stop
    "le la les et de des un une est pour dans que",         # fr
    "el la los y de un una es por para con que",            # es ('la'/'de'
                                                            # overlap fr: tie)
    "de la",                                                # de-vs-es-vs-fr tie
    "你好世界 这是一个测试 中文内容占比很高",                      # zh
    "mixed 你好 text with some cjk but not enough to trip the gate",
    "word " * 1000,                                         # truncation: 4000
    "x" * 1999 + "你" * 200,                                 # cjk at 2000 edge
    "a" * 4000 + " the and of to a in is that",             # stopwords beyond
                                                            # the 4000 cut
    "ÀÉÎÕÜ àéîõü ÿ word",                                    # accented range
    "İstanbul DİYARBAKIR ß ẞ",                               # tricky lowering
    "no-stop-words here: zzz qqq kkk xxx www",
    "punct!!! ??? ,,, ;;; :::",
    "  leading and trailing   ",
    "singleword",
    "1 2 3 4 5 6 7 8 9 0",
    "emoji 😀 text 🎉 the and of",
    "nbsp separated the and of",          # unicode ws
    "line sep the and of to a in",
    "the\x0band\x0cof to a in is that for it",               # exotic ascii ws
    "æøå þð the and of to",                                   # beyond-ÿ letters
]


def test_langid_vector_equals_reference_adversarial():
    stage = LangIdStage()
    got = stage._classify_batch(pa.array(ADVERSARIAL, type=pa.string()))
    want = [stage.classify(t) for t in ADVERSARIAL]
    assert got.to_pylist() == want


def test_quality_vector_equals_reference_adversarial():
    stage = QualityStage()
    sig = stage._signals(pa.array(ADVERSARIAL, type=pa.string()))
    ref = stage._signals_ref(ADVERSARIAL)
    for name, want in ref.items():
        np.testing.assert_allclose(
            sig[name], want, rtol=0, atol=0, err_msg=name)
    np.testing.assert_allclose(
        QualityStage._score(sig), QualityStage._score(ref))


@settings(max_examples=200, deadline=None)
@given(st.lists(
    st.one_of(
        st.none(),
        # exclude Cn: codepoints unassigned in CPython's Unicode tables
        # can be letters to RE2's newer tables (documented version skew)
        st.text(alphabet=st.characters(exclude_categories=("Cs", "Cn")),
                max_size=300),
        st.text(alphabet="the and of der die das le la el 你好 à ÿ .!?,;: \t\n",
                max_size=200),
    ),
    min_size=1, max_size=20))
def test_textstats_vector_equals_reference_fuzz(texts):
    lstage = LangIdStage()
    got = lstage._classify_batch(pa.array(texts, type=pa.string()))
    assert got.to_pylist() == [lstage.classify(t) for t in texts]

    qstage = QualityStage()
    sig = qstage._signals(pa.array(texts, type=pa.string()))
    ref = qstage._signals_ref(texts)
    for name, want in ref.items():
        np.testing.assert_allclose(sig[name], want, rtol=0, atol=0,
                                   err_msg=name)


def test_langid_stage_batch_surface(ray_session):
    import ray.data

    docs = pa.table({"doc_id": pa.array(range(len(ADVERSARIAL)), pa.int64()),
                     "text": pa.array(ADVERSARIAL, pa.string())})
    out = (ray.data.from_arrow(docs)
           .map_batches(LangIdStage, batch_format="pyarrow", concurrency=1)
           .map_batches(QualityStage, batch_format="pyarrow", concurrency=1)
           .sort("doc_id").take_all())
    stage = LangIdStage()
    assert [r["lang_pred"] for r in out] == [
        stage.classify(t) for t in ADVERSARIAL]
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in out)
