"""X5 tokenizer machinery tests on a fixture dictionary (huqie.txt is not
shippable; the algorithm is what's pinned here)."""

import pytest

from ragflow_spark.core.tokenizer import RagTokenizer, porter_stem

# fixture dictionary: word frequency tag
DICT = [
    "数据 500000 n",
    "数据库 800000 n",
    "库管理 100 n",
    "管理 600000 v",
    "管理系统 300000 n",
    "系统 700000 n",
    "数据库管理系统 200000 n",
    "查询 400000 v",
    "引擎 300000 n",
    "查询引擎 250000 n",
    "分布 200000 n",
    "分布式 350000 n",
    "式查询 50 n",
]


@pytest.fixture(scope="module")
def tk():
    return RagTokenizer(DICT)


def test_max_forward_greedy(tk):
    tks, _ = tk.maxForward_("数据库管理系统")
    assert tks == ["数据库管理系统"]


def test_max_forward_falls_back(tk):
    tks, _ = tk.maxForward_("数据管理")
    assert tks == ["数据", "管理"]


def test_max_backward(tk):
    tks, _ = tk.maxBackward_("查询引擎")
    assert tks == ["查询引擎"]


def test_dfs_best_segmentation(tk):
    tkslist = []
    tk.dfs_("分布式查询引擎", 0, [], tkslist)
    best = tk.sortTks_(tkslist)[0][0]
    # 分布式 + 查询引擎 outscores 分布 + 式查询 + 引擎 (higher freq, fewer toks)
    assert best == ["分布式", "查询引擎"]


def test_tokenize_mixed_cjk_latin(tk):
    out = tk.tokenize("спарк Spark 数据库管理系统 queries 分布式查询引擎!")
    assert "数据库管理系统" in out.split(" ")
    assert "分布式" in out.split(" ")
    assert "查询引擎" in out.split(" ")
    # Latin goes through the stemmer path
    assert "queri" in out.split(" ")


def test_tokenize_pure_english_stems(tk):
    out = tk.tokenize("Connections were processed quickly and caresses happened")
    toks = out.split(" ")
    assert "connect" in toks
    assert "process" in toks
    assert "quickli" in toks  # original Porter output
    assert "caress" in toks


def test_fine_grained_second_best(tk):
    coarse = tk.tokenize("数据库管理系统")
    fine = tk.fine_grained_tokenize(coarse)
    # the second-best segmentation splits the compound
    assert fine != coarse
    assert set(fine.split(" ")) <= {"数据库", "管理系统", "数据", "库管理", "系统", "管理"}


def test_freq_and_tag(tk):
    assert tk.freq("数据库") > 0
    assert tk.tag("管理") == "v"
    assert tk.freq("不存在词") == 0


@pytest.mark.parametrize("word,stem", [
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("falling", "fall"),
    ("happy", "happi"),
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("digitizer", "digit"),
    ("operator", "oper"),
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("adoption", "adopt"),
    ("probate", "probat"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
])
def test_porter_canonical_vectors(word, stem):
    # vectors from Porter's 1980 paper examples
    assert porter_stem(word) == stem


# ------------------------------------------------ properties + Spark op

def test_cjk_roundtrip_property(tk):
    """For CJK-only input, tokenization must be a partition: joining the
    tokens reproduces the input exactly."""


    from hypothesis import given, settings
    from hypothesis import strategies as st

    chars = "数据库管理系统查询引擎分布式"

    @settings(max_examples=150, deadline=None)
    @given(st.text(alphabet=chars, min_size=2, max_size=30))
    def check(s):
        out = tk.tokenize(s)
        assert out.replace(" ", "") == s

    check()


def test_tokenize_column_spark(spark):
    from ragflow_spark.operators.textstats import tokenize_column

    rows = [
        (1, "数据库管理系统 handles queries"),
        (2, "分布式查询引擎 scaling"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.content_ltks, r.content_sm_ltks)
           for r in tokenize_column(df, "doc_id", "text", DICT).collect()}
    expect_tk = RagTokenizer(DICT)
    for i, (_id, text) in enumerate(rows, start=1):
        ltks = expect_tk.tokenize(rows[i - 1][1])
        assert out[i][0] == ltks
        assert out[i][1] == expect_tk.fine_grained_tokenize(ltks)
    assert "数据库管理系统" in out[1][0]


# ------------------------------------------------------- tradi2simp (X4)

def test_tradi2simp_common_pairs():
    from ragflow_spark.core.hanzi import TRADI2SIMP_FIXTURE, to_simplified

    assert len(TRADI2SIMP_FIXTURE) >= 250
    assert to_simplified("電腦網絡學習") == "电脑网络学习"
    assert to_simplified("國家圖書館開門") == "国家图书馆开门"
    # untabled + non-CJK chars pass through
    assert to_simplified("abc 123 已简化") == "abc 123 已简化"


def test_tradi2simp_load_table_tsv(tmp_path):
    from ragflow_spark.core.hanzi import load_table, to_simplified

    p = tmp_path / "map.tsv"
    p.write_text("龜\t龟\n", encoding="utf-8")
    t = load_table(str(p))
    assert to_simplified("龜", t) == "龟"


def test_tokenize_applies_tradi2simp():
    from ragflow_spark.core.tokenizer import RagTokenizer

    tk = RagTokenizer(["电脑 5 n", "学习 5 n"])
    # traditional input segments identically to its simplified form
    assert tk.tokenize("電腦學習") == tk.tokenize("电脑学习")


def test_tradi2simp_table_invariants():
    """r5 expanded table (~918 pairs): structurally sound — every source
    entry is a 2-char pair, no traditional char maps two ways, and no
    simplified output is itself a key mapping elsewhere (no chains, so
    single-pass str.translate is idempotent like hanziconv's)."""
    from ragflow_spark.core.hanzi import _PAIRS, TRADI2SIMP_FIXTURE

    assert len(TRADI2SIMP_FIXTURE) >= 900
    seen: dict[str, str] = {}
    for p in _PAIRS.split():
        assert len(p) == 2, p
        t, s = p
        assert seen.get(t, s) == s, f"conflicting mapping for {t}"
        seen[t] = s
    for t, s in seen.items():
        if s != t and s in seen:
            assert seen[s] == s, f"chain {t}->{s}->{seen[s]}"
    out = "".join(TRADI2SIMP_FIXTURE.values())
    assert out == out.translate(TRADI2SIMP_FIXTURE)  # idempotent


def test_tradi2simp_r5_expansion_pairs():
    from ragflow_spark.core.hanzi import to_simplified

    assert to_simplified("臺灣鐵路縱貫線") == "台湾铁路纵贯线"
    assert to_simplified("醫藥費證明書") == "医药费证明书"
    assert to_simplified("變更紀錄檔") == "变更纪录档"


def test_tokenize_column_dict_path_singleton(spark, tmp_path):
    """dict_path mode (the --files deploy shape) must produce byte-equal
    output to the closure-shipped dict_lines mode, loading the trie ONCE
    per worker process via the module-level singleton."""
    from ragflow_spark.operators import textstats
    from ragflow_spark.operators.textstats import tokenize_column

    p = tmp_path / "dict.txt"
    p.write_text("\n".join(DICT), encoding="utf-8")
    rows = [(i, "数据库管理系统 handles 分布式查询引擎 queries") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted((r.doc_id, r.content_ltks, r.content_sm_ltks)
               for r in tokenize_column(df, "doc_id", "text", DICT).collect())
    b = sorted((r.doc_id, r.content_ltks, r.content_sm_ltks)
               for r in tokenize_column(df, "doc_id", "text",
                                        dict_path=str(p)).collect())
    assert a == b
    # driver-side singleton contract: same path → same object, cache
    # bounded to one dict at a time
    t1 = textstats._worker_tokenizer(str(p))
    t2 = textstats._worker_tokenizer(str(p))
    assert t1 is t2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tokenize_column(df, "doc_id", "text")
    with _pytest.raises(ValueError):
        tokenize_column(df, "doc_id", "text", DICT, dict_path=str(p))
