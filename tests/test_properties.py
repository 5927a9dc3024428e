"""Property-based invariants (hypothesis) over the MapleJuice API and
dedup operators — randomized inputs, closed-form properties. Example
counts are small because every example runs Spark jobs; the properties,
not the volume, carry the value.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from distributed_computing_projects_spark.operators import dedup as D
from distributed_computing_projects_spark.operators.maplejuice import juice, maple
from distributed_computing_projects_spark.operators.wordcount import wordcount

WORD = st.text(alphabet="abcxyz", min_size=1, max_size=4)
TEXT = st.lists(WORD, min_size=0, max_size=12).map(" ".join)

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=st.lists(TEXT, min_size=1, max_size=6))
@PROP
def test_maplejuice_wordcount_equals_dataframe_wordcount(spark, texts):
    df = spark.createDataFrame([Row(text=t) for t in texts])

    def wc_maple(line):
        for w in line.split():
            yield w, "1"

    def wc_juice(key, values):
        return str(sum(int(v) for v in values))

    via_api = {
        (r.key, int(r.value))
        for r in juice(maple(df, wc_maple), wc_juice).collect()
    }
    via_df = {(r[0], r[1]) for r in wordcount(df, "text").collect()}
    assert via_api == via_df


@given(
    kvs=st.lists(
        st.tuples(st.sampled_from("abcde"), st.integers(0, 9)),
        min_size=1, max_size=20,
    ),
    n=st.integers(1, 4),
)
@PROP
def test_juice_hash_and_range_partitioning_agree(spark, kvs, n):
    """Partitioning strategy is a physical choice — results must be
    identical (the reference's partitioner only places keys,
    mp3/src/partition.go:9-38)."""
    df = spark.createDataFrame([Row(key=k, value=str(v)) for k, v in kvs])

    def add(key, values):
        return str(sum(int(v) for v in values))

    h = [tuple(r) for r in juice(df, add, num_juices=n, partition="hash").collect()]
    r = [tuple(r) for r in juice(df, add, num_juices=n, partition="range").collect()]
    assert h == r  # both key-sorted, same content


@given(texts=st.lists(TEXT.filter(lambda t: t.strip()), min_size=1, max_size=8))
@PROP
def test_exact_dedup_partitions_the_corpus(spark, texts):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    rows = D.exact_dedup(df, "doc_id", "text").collect()
    assert sum(r.n_copies for r in rows) == len(texts)  # partition, no loss
    keep = [r.keep_id for r in rows]
    assert len(keep) == len(set(keep))  # one survivor per group


@given(words=st.lists(WORD, min_size=3, max_size=10))
@PROP
def test_minhash_estimate_bounds_and_self_similarity(spark, words):
    t = " ".join(words)
    df = spark.createDataFrame([Row(doc_id=0, text=t), Row(doc_id=1, text=t)])
    pairs = D.minhash_lsh_pairs(df, "doc_id", "text", threshold=0.0).collect()
    # identical docs always collide in every band with estimate exactly 1
    assert [(p.id_a, p.id_b, p.est_jaccard) for p in pairs] == [(0, 1, 1.0)]


@given(ns=st.lists(st.integers(0, 40), min_size=1, max_size=20),
       budget=st.integers(5, 50))
@PROP
def test_packing_invariants(spark, ns, budget):
    """For ANY token-count sequence and budget: every doc packed exactly
    once; pack ids contiguous from 0; every multi-doc pack within
    budget (only singleton packs may exceed it)."""
    from distributed_computing_projects_spark.operators.packing import (
        pack_documents,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["w"] * n)) for i, n in enumerate(ns)]
    )
    rows = pack_documents(df, "doc_id", "text", budget, n_shards=1).collect()
    assert sorted(r.id for r in rows) == list(range(len(ns)))
    packs: dict[int, list[int]] = {}
    for r in rows:
        packs.setdefault(r.pack_id, []).append(r.n_tokens)
    assert sorted(packs) == list(range(len(packs)))
    for members in packs.values():
        if len(members) > 1:
            assert sum(members) <= budget


@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=30,
                    unique=True),
       rate=st.integers(0, 10_000))
@PROP
def test_sampling_invariants(spark, ids, rate):
    """Membership is a pure per-id function: the sample of a subset is
    the subset of the sample; rate 0 keeps nothing, 10000 everything."""
    from distributed_computing_projects_spark.operators.sampling import (
        deterministic_sample,
    )

    df = spark.createDataFrame([Row(doc_id=i) for i in ids])
    kept = {r.doc_id for r in
            deterministic_sample(df, "doc_id", rate).collect()}
    if rate == 0:
        assert kept == set()
    if rate == 10_000:
        assert kept == set(ids)
    half = ids[: len(ids) // 2]
    if half:
        sub = spark.createDataFrame([Row(doc_id=i) for i in half])
        sub_kept = {r.doc_id for r in
                    deterministic_sample(sub, "doc_id", rate).collect()}
        assert sub_kept == kept & set(half)


@given(
    texts=st.lists(TEXT, min_size=1, max_size=6),
    chunk=st.integers(1, 8),
    overlap_frac=st.integers(0, 99),
)
@PROP
def test_chunking_reconstructs_documents(spark, texts, chunk, overlap_frac):
    """For ANY text/window/overlap: concatenating each doc's chunks
    with the overlap dropped reproduces the doc's token stream exactly
    — no token lost, duplicated, or reordered. Plus: every chunk but
    the last is full-size is NOT guaranteed (the tail is short), but
    every chunk is non-empty and within budget."""
    from distributed_computing_projects_spark.operators.chunking import (
        chunk_documents,
    )

    overlap = (chunk * overlap_frac) // 100  # always < chunk
    step = chunk - overlap
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    out = chunk_documents(df, "doc_id", "text", chunk, overlap).collect()
    chunks = {}
    for r in out:
        assert 1 <= r.n_tokens <= chunk
        assert r.start_token == r.chunk_id * step
        toks = r.chunk_text.split()
        assert len(toks) == r.n_tokens
        chunks.setdefault(r.doc_id, []).append((r.chunk_id, toks))
    for i, t in enumerate(texts):
        want = t.split()
        got = []
        for cid, toks in sorted(chunks.get(i, [])):
            got.extend(toks if cid == 0 else toks[overlap:])
        # overlapped tokens must agree between neighbouring chunks
        for (c1, t1), (c2, t2) in zip(sorted(chunks.get(i, [])),
                                      sorted(chunks.get(i, []))[1:]):
            if overlap and len(t1) == chunk:
                assert t1[step:] == t2[: len(t1[step:])]
        assert got == want


@given(texts=st.lists(TEXT, min_size=1, max_size=6))
@PROP
def test_repetition_stats_invariants(spark, texts):
    """Closed-form cross-checks against Python on arbitrary word
    streams: exact integer counts, plus the derived-ratio identities
    (raw IEEE divides — bit-comparable against Python's float division
    by construction, no rounding contract needed)."""
    from distributed_computing_projects_spark.operators.textstats import (
        repetition_stats,
        with_repetition_ratios,
    )

    df = spark.createDataFrame([Row(doc_id=i, text=t)
                                for i, t in enumerate(texts)])
    out = {r.id: r for r in with_repetition_ratios(
        repetition_stats(df, "doc_id", "text")).collect()}
    for i, t in enumerate(texts):
        toks = t.split()
        if not toks:
            assert i not in out
            continue
        r = out[i]
        grams = [" ".join(toks[j:j + 2]) for j in range(len(toks) - 1)]
        top = max(toks.count(w) for w in set(toks))
        assert r.n_tokens == len(toks)
        assert r.n_distinct == len(set(toks))
        assert r.top_c == top
        assert r.n_bigrams == len(grams)
        assert r.n_dup_bigrams == len(grams) - len(set(grams))
        assert r.distinct_token_ratio == len(set(toks)) / len(toks)
        assert r.dup_bigram_frac == (
            (len(grams) - len(set(grams))) / len(grams) if grams else 0.0
        )
        assert r.top_token_frac == top / len(toks)


@given(texts=st.lists(TEXT, min_size=2, max_size=6))
@PROP
def test_incremental_pairs_subset_of_self_join_pairs(spark, texts):
    """Every (new, corpus) incremental pair must appear in the corpus-
    wide self-join at the same threshold (as an unordered id pair) —
    incremental dedup is a restriction, never a new candidate source."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, src="new" if i % 2 == 0 else "old")
         for i, t in enumerate(texts)]
    )
    full = {
        frozenset((r.id_a, r.id_b))
        for r in D.minhash_lsh_pairs(df, "doc_id", "text",
                                     threshold=0.0).collect()
    }
    incr = {
        frozenset((r.new_id, r.corpus_id))
        for r in D.lsh_incremental_pairs_single_scan(
            df, "doc_id", "text", F.col("src") == "new", threshold=0.0
        ).collect()
    }
    assert incr <= full


@given(texts=st.lists(TEXT, min_size=2, max_size=6),
       split=st.integers(min_value=1, max_value=5))
@PROP
def test_bandstore_probe_equals_direct_incremental(spark, tmp_path_factory,
                                                   texts, split):
    """For ANY corpus/batch split, probing the persisted band store
    must yield exactly the pairs of the direct two-frame incremental
    join — the store is a cache, never a semantics change."""
    from distributed_computing_projects_spark.operators import (
        bandstore as BS,
    )

    df = spark.createDataFrame([Row(doc_id=i, text=t)
                                for i, t in enumerate(texts)])
    k = split % len(texts) or 1
    corpus = df.filter(f"doc_id < {k}")
    batch = df.filter(f"doc_id >= {k}")
    path = str(tmp_path_factory.mktemp("bands") / "store")
    BS.write_bands(corpus, path, "doc_id", "text")
    got = sorted((r.new_id, r.corpus_id, round(r.est_jaccard, 9))
                 for r in BS.incremental_pairs_against_store(
                     spark, path, batch, "doc_id", "text",
                     threshold=0.25).collect())
    want = sorted((r.new_id, r.corpus_id, round(r.est_jaccard, 9))
                  for r in D.lsh_incremental_pairs(
                      batch, corpus, "doc_id", "text",
                      threshold=0.25).collect())
    assert got == want


@given(seed=st.integers(min_value=0, max_value=10**6))
@PROP
def test_knn_tables_candidates_superset_of_single(spark, seed):
    """Band-OR blocking with L tables must never LOSE a pair the
    single-table blocking found (table 0 is the single table), for
    arbitrary deterministic vector sets."""
    from distributed_computing_projects_spark.functions import text as T
    from distributed_computing_projects_spark.operators import (
        autoplanes as AP,
        similarity as S,
    )

    vecs = [
        Row(vec_id=i, embedding=[
            (((seed + i * 31 + j * 7) % 2001) - 1000) / 1000.0
            for j in range(T.EMBEDDING_DIM)
        ])
        for i in range(12)
    ]
    df = spark.createDataFrame(vecs)
    single = {(r.id, r.neighbour_id) for r in S.knn_join(
        df, "vec_id", "embedding", 11, n_planes=3,
        persist=False).collect()}
    multi = {(r.id, r.neighbour_id) for r in AP.knn_join_tables(
        df, "vec_id", "embedding", 11, n_planes=3, n_tables=2,
        persist=False).collect()}
    # k = N-1, so top-k IS the candidate set: superset must hold
    assert single <= multi


@given(
    data=st.data(),
    ncomp=st.sampled_from([1, 3]),
    by=st.integers(1, 3),
    bx=st.integers(1, 3),
    restart=st.sampled_from([0, 1, 2]),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_jpeg_entropy_roundtrip_property(data, ncomp, by, bx, restart):
    """Any quantized coefficient layout (arbitrary sparsity, negatives,
    arbitrary zero-run structure, with/without restart markers) must
    survive encode -> decode_coeffs exactly as coeff * qstep."""
    import numpy as np

    from distributed_computing_projects_spark.operators import jpeg as J

    comps = []
    for _ in range(ncomp):
        c = np.zeros((by, bx, 64), dtype=np.int64)
        for yb in range(by):
            for xb in range(bx):
                n_nonzero = data.draw(st.integers(0, 8))
                ks = data.draw(st.lists(st.integers(0, 63), min_size=n_nonzero,
                                        max_size=n_nonzero, unique=True))
                for k in ks:
                    lo = -128 if k == 0 else -255
                    hi = 127 if k == 0 else 255
                    v = data.draw(st.integers(lo, hi))
                    c[yb, xb, k] = v if (v or k == 0) else 1
        comps.append(c)
    qtable = [data.draw(st.integers(1, 32)) for _ in range(64)]
    b = J.encode_baseline(comps, bx * 8, by * 8, qtable,
                          restart_interval=restart)
    out = J.decode_coeffs(b)
    assert out is not None
    w, h, dec, _samps = out
    q = np.array(qtable, dtype=np.int64)
    for ci in range(ncomp):
        assert np.array_equal(dec[ci], comps[ci] * q)


@given(
    data=st.data(),
    ncomp=st.sampled_from([1, 3]),
    by=st.integers(1, 3),
    bx=st.integers(1, 3),
    dc_al=st.integers(0, 3),
    bands=st.sampled_from([
        ((1, 63, 0),),
        ((1, 5, 1), (6, 63, 0)),
        ((1, 10, 2), (11, 40, 1), (41, 63, 0)),
    ]),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_jpeg_progressive_roundtrip_property(data, ncomp, by, bx,
                                             dc_al, bands):
    """Any quantized coefficient layout must survive PROGRESSIVE
    encode -> decode_coeffs exactly, for any scan script (DC
    successive-approximation depth x spectral-selection band splits
    with per-band successive approximation): every coefficient bit is
    eventually delivered, so the full stream reconstructs coeff * q
    bit-exactly — same contract as the baseline property above."""
    import numpy as np

    from distributed_computing_projects_spark.operators import jpeg as J

    comps = []
    for _ in range(ncomp):
        c = np.zeros((by, bx, 64), dtype=np.int64)
        for yb in range(by):
            for xb in range(bx):
                n_nonzero = data.draw(st.integers(0, 8))
                ks = data.draw(st.lists(st.integers(0, 63),
                                        min_size=n_nonzero,
                                        max_size=n_nonzero, unique=True))
                for k in ks:
                    lo = -128 if k == 0 else -255
                    hi = 127 if k == 0 else 255
                    v = data.draw(st.integers(lo, hi))
                    c[yb, xb, k] = v if (v or k == 0) else 1
        comps.append(c)
    qtable = [data.draw(st.integers(1, 32)) for _ in range(64)]
    b = J.encode_progressive(comps, bx * 8, by * 8, qtable,
                             dc_al=dc_al, ac_bands=bands)
    out = J.decode_coeffs(b)
    assert out is not None
    w, h, dec, _samps = out
    q = np.array(qtable, dtype=np.int64)
    for ci in range(ncomp):
        assert np.array_equal(dec[ci], comps[ci] * q)


# ---------------------------------------------------------------------------
# Round-9 families: pure-Python properties (no Spark session needed)
# ---------------------------------------------------------------------------


@given(data=st.binary(min_size=0, max_size=400))
@settings(max_examples=200, deadline=None)
def test_packbits_roundtrip_any_bytes(data):
    from distributed_computing_projects_spark.operators.multimodal import (
        _packbits_decode,
    )
    from tests.test_tiff import packbits_encode

    assert _packbits_decode(packbits_encode(data)) == data


@given(
    pred=st.integers(-32768, 32767),
    idx=st.integers(0, 88),
    nibbles=st.lists(st.integers(0, 255), min_size=0, max_size=64),
)
@settings(max_examples=150, deadline=None)
def test_ima_decode_matches_reference_recurrence(pred, idx, nibbles):
    import struct

    from distributed_computing_projects_spark.operators import (
        multimodal as M,
    )
    from tests.test_g711_adpcm import _ima_ref

    body = struct.pack("<hBB", pred, idx, 0) + bytes(nibbles)
    got = M._ima_decode_block(body)
    nibs = []
    for b in nibbles:
        nibs += [b & 0x0F, b >> 4]
    assert [int(x) for x in got] == _ima_ref(pred, idx, nibs)
    # every output stays in int16 range (the clamp actually clamps)
    assert all(-32768 <= int(x) <= 32767 for x in got)


@given(
    edges=st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 12)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_matches_python_on_random_graphs(spark, edges):
    from distributed_computing_projects_spark.operators import (
        graphrank as G,
    )
    from tests.test_graphrank import _py_pagerank

    # ensure no dangling nodes (the operator's documented precondition):
    # add the reverse of every edge
    sym = sorted(set(edges) | {(d, s) for s, d in edges})
    df = spark.createDataFrame(sym, ["src", "dst"])
    got = {
        r["node"]: r["rank"]
        for r in G.pagerank_fixedpoint(df).collect()
    }
    want = _py_pagerank(sym, G.N_ITERS)
    assert got == want


# pure-python codec properties: no Spark jobs, so examples are cheap
FAST = settings(max_examples=200, deadline=None)


@given(raw=st.binary(min_size=0, max_size=200))
@FAST
def test_pdf_string_escape_roundtrip(raw):
    from distributed_computing_projects_spark.sources import pdf as P

    assert P.unescape_string(P.escape_string(raw)) == raw


@given(chunks=st.lists(st.binary(min_size=0, max_size=64),
                       min_size=1, max_size=6),
       level=st.integers(min_value=0, max_value=9))
@FAST
def test_gzip_member_stream_roundtrip(chunks, level):
    """Member-per-record gzip concatenation inverts exactly, at every
    compression level, including empty members."""
    import gzip

    from distributed_computing_projects_spark.sources import warc as W

    stream = b"".join(
        gzip.compress(c, compresslevel=level, mtime=0) for c in chunks)
    assert W.gunzip_members(stream) == b"".join(chunks)


@given(raw=st.binary(min_size=64, max_size=64),
       flate=st.booleans())
@FAST
def test_pdf_text_extraction_roundtrip(raw, flate):
    from distributed_computing_projects_spark.sources import pdf as P

    got = P.extract_text(P.build_pdf(raw, flate))
    assert got is not None
    assert got[3] == raw


@given(depth=st.sampled_from([1, 2, 4, 8]),
       w=st.integers(min_value=1, max_value=9),
       h=st.integers(min_value=1, max_value=5),
       seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=40, deadline=None)
def test_png_palette_roundtrip_property(depth, w, h, seed):
    import numpy as np

    from distributed_computing_projects_spark.operators import (
        multimodal as M,
    )

    rng = np.random.RandomState(seed)
    n = 1 << depth
    pal = rng.randint(0, 256, size=(n, 3)).astype(np.uint8)
    idx = rng.randint(0, n, size=(h, w)).astype(np.uint8)
    filters = [rng.randint(0, 5) for _ in range(h)]
    png = M.encode_png_indexed(idx, pal, depth, filters,
                               interlace=bool(seed % 2))
    got = M._decode_png(png)
    assert got is not None
    assert np.array_equal(got[2], pal[idx])


@given(raw=st.binary(min_size=64, max_size=64),
       predictor=st.booleans())
@settings(max_examples=40, deadline=None)
def test_pdf_objstm_roundtrip_property(raw, predictor):
    """Any 64 text bytes survive the full PDF 1.5 object-model path:
    ObjStm pack/unpack, xref-stream (predicted or raw), indirect
    /Length, Flate, operator scan, escape decode."""
    from distributed_computing_projects_spark.sources import pdfobj as PO

    f = PO.extract_facts(PO.build_pdf_objstm(raw, predictor))
    assert f is not None
    assert f["n_chars"] == 64 and f["prefix_sum"] == sum(raw)
    assert f["pred"] == (12 if predictor else 1)


@given(raw=st.binary(min_size=64, max_size=64), flate=st.booleans())
@settings(max_examples=40, deadline=None)
def test_pdf_tounicode_roundtrip_property(raw, flate):
    """Any 64 text bytes survive hex-string CID encoding + ToUnicode
    CMap decode (bfchar below 0x20, bfrange above): mapped code
    points must sum to the source bytes."""
    from distributed_computing_projects_spark.sources import pdfobj as PO

    f = PO.extract_facts(PO.build_pdf_tounicode(raw, flate))
    assert f is not None
    assert f["prefix_sum"] == sum(raw) + PO.TOUNICODE_TAIL_SUM


@given(data=st.binary(min_size=16, max_size=400),
       width=st.integers(1, 16))
@settings(max_examples=60, deadline=None)
def test_png_up_predictor_roundtrip_property(data, width):
    """At least one full row (a 0-row predicted stream is the drop,
    by policy: _apply_predictor returns None on h == 0)."""
    from distributed_computing_projects_spark.sources import pdfobj as PO

    rows = data[: (len(data) // width) * width]
    out = PO._apply_predictor(
        PO._up_filter(rows, width), {"Predictor": 12, "Columns": width})
    assert out == rows


@given(text=st.binary(min_size=0, max_size=300))
@settings(max_examples=40, deadline=None)
def test_wet_conversion_block_roundtrip_property(text):
    """WARC blocks are Content-Length-delimited: ANY byte string —
    including bytes that look like record boundaries — survives a
    conversion-record roundtrip exactly."""
    from distributed_computing_projects_spark.sources import warc as W

    records = W.parse_records(W.build_conversion_record("https://a/1", text))
    assert records is not None and len(records) == 1
    headers, block = records[0]
    assert headers["warc-type"] == "conversion" and block == text


@given(words=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                      min_size=1, max_size=8))
@settings(max_examples=25, deadline=None)
def test_wikitext_strip_is_identity_on_plain_text(words):
    """Text with no markup characters passes the whole strip chain
    unchanged (modulo the whitespace-collapse contract)."""
    import duckdb

    from distributed_computing_projects_spark.functions import wikitext as WT

    plain = " ".join(words)
    q = f"SELECT {WT.strip_wikitext(WT.sql_literal(plain, 'duck'), 'duck')}"
    assert duckdb.sql(q).fetchone()[0] == plain


# -- r13 codec seams: round-trip properties -----------------------------------

BLOB = st.binary(min_size=0, max_size=4096)


@PROP
@given(data=BLOB, ec=st.integers(0, 1))
def test_prop_lzw_roundtrip(data, ec):
    from distributed_computing_projects_spark.functions.lzw import (
        lzw_decode,
    )
    from distributed_computing_projects_spark.sources.pdfobj import (
        _lzw_encode,
    )

    assert lzw_decode(_lzw_encode(data, ec), ec) == data


@PROP
@given(data=BLOB)
def test_prop_pdf_ascii_filters_roundtrip(data):
    from distributed_computing_projects_spark.sources import pdfobj as PO

    assert PO._asciihex_decode(PO._asciihex_encode(data)) == data
    assert PO._ascii85_decode(PO._ascii85_encode(data)) == data
    assert PO._runlength_decode(PO._runlength_encode(data)) == data


@PROP
@given(data=BLOB)
def test_prop_zstd_brotli_roundtrip(data):
    import pytest

    from distributed_computing_projects_spark.functions import (
        brotlilib as B,
        zstdlib as Z,
    )

    if not (Z.available() and B.available()):
        pytest.skip("codec backends missing")
    d = Z.ZstdDecompressor()
    assert d.decompress(Z.compress(data), 1 << 20) == data and d.eof
    assert B.decompress(B.compress(data), 1 << 20) == data


@PROP
@given(data=BLOB)
def test_prop_content_encoding_chain_roundtrip(data):
    import pytest

    from distributed_computing_projects_spark.functions import (
        brotlilib as B,
    )
    from distributed_computing_projects_spark.sources import warc as W

    if not B.available():
        pytest.skip("libbrotli missing")
    for ce in ("gzip", "deflate", "br", "gzip, br", "br, gzip, deflate"):
        head = b"HTTP/1.1 200 OK\r\nContent-Encoding: " + ce.encode()
        assert W.decode_content_encoding(
            head, W.encode_http_body(data, ce)) == data


@PROP
@given(px=st.binary(min_size=48, max_size=48))
def test_prop_webp_lossless_roundtrip(px):
    import pytest

    from distributed_computing_projects_spark.functions import (
        webplib as WP,
    )

    if not WP.available():
        pytest.skip("libwebp missing")
    w, h, out = WP.decode_rgb(WP.encode_lossless_rgb(px, 4, 4), 1 << 20)
    assert (w, h, out) == (4, 4, px)


@PROP
@given(
    lines=st.lists(
        st.text(alphabet=st.characters(blacklist_characters="\n\r",
                                       blacklist_categories=("Cs",)),
                max_size=40),
        max_size=30),
    codec=st.sampled_from(["zst", "xz", "bz2", "lz4"]),
    cuts=st.lists(st.integers(0, 30), max_size=3),
)
def test_prop_compressed_line_walker_roundtrip(lines, codec, cuts):
    """Any line corpus split at any boundaries into concatenated
    frames/streams walks back to exactly the original lines — the
    jsonl_zst/xz ingest invariant (sources/compressed.py)."""
    import bz2 as bz2mod
    import lzma

    import pytest

    from distributed_computing_projects_spark.functions import zstdlib as Z
    from distributed_computing_projects_spark.sources.compressed import (
        decompressor_factory,
        iter_lines,
    )

    from distributed_computing_projects_spark.functions import lz4lib

    if codec == "zst" and not Z.available():
        pytest.skip("libzstd missing")
    if codec == "lz4" and not lz4lib.available():
        pytest.skip("liblz4 missing")
    packer = {"zst": Z.compress, "xz": lzma.compress,
              "bz2": bz2mod.compress, "lz4": lz4lib.compress}[codec]
    plain = ("\n".join(lines) + "\n").encode("utf-8") if lines else b""
    bounds = sorted({min(c, len(plain)) for c in cuts} | {0, len(plain)})
    payload = b"".join(packer(plain[a:b])
                       for a, b in zip(bounds, bounds[1:]) if b > a)
    got = list(iter_lines(payload, decompressor_factory(f"f.{codec}")))
    assert got == [ln.encode("utf-8") for ln in lines]


@PROP
@given(px=st.binary(min_size=48, max_size=48),
       codec=st.sampled_from(["avif", "heic"]))
def test_prop_heif_lossless_roundtrip(px, codec):
    import pytest

    from distributed_computing_projects_spark.functions import (
        heiflib as HL,
    )

    comp = (HL.COMPRESSION_AV1 if codec == "avif"
            else HL.COMPRESSION_HEVC)
    if not (HL.available() and HL.encoder_available(comp)):
        pytest.skip("libheif/encoder missing")
    w, h, out = HL.decode_rgb(
        HL.encode_lossless_rgb(px, 4, 4, comp), 1 << 20)
    assert (w, h, out) == (4, 4, px)


@PROP
@given(
    recs=st.lists(
        st.fixed_dictionaries({
            "a": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "b": st.one_of(st.none(), st.floats(allow_nan=False,
                                                allow_infinity=False)),
            "c": st.text(max_size=20),
            "arr": st.lists(st.integers(-(2**31), 2**31 - 1),
                            max_size=4),
        }),
        max_size=25),
    codec=st.sampled_from(["null", "deflate", "bzip2", "xz",
                           "zstandard", "snappy"]),
    per_block=st.integers(1, 9),
)
def test_prop_avro_ocf_roundtrip(recs, codec, per_block):
    import pytest

    from distributed_computing_projects_spark.sources import avro as AV

    if codec == "zstandard":
        from distributed_computing_projects_spark.sources.warc import (
            zstd_backend,
        )
        if zstd_backend() is None:
            pytest.skip("no zstd backend")
    schema = {"type": "record", "name": "P", "fields": [
        {"name": "a", "type": "long"},
        {"name": "b", "type": ["null", "double"]},
        {"name": "c", "type": "string"},
        {"name": "arr", "type": {"type": "array", "items": "int"}},
    ]}
    data = AV.write_ocf(recs, schema, codec=codec,
                        records_per_block=per_block)
    assert list(AV.iter_records(data)) == recs


@PROP
@given(
    samples=st.lists(
        st.tuples(
            st.text(alphabet="abcdef0123456789_-", min_size=1,
                    max_size=12),
            st.dictionaries(
                st.sampled_from(["txt", "cls", "meta.json", "bin"]),
                st.binary(max_size=200), min_size=1, max_size=3)),
        max_size=12, unique_by=lambda s: s[0]),
)
def test_prop_webdataset_shard_roundtrip(samples):
    from distributed_computing_projects_spark.sources import (
        webdataset as WD,
    )

    shard = WD.build_shard(samples)
    assert list(WD.iter_samples(shard)) == samples


@PROP
@given(data=BLOB, cols=st.integers(1, 64))
def test_prop_tiff_predictor2_roundtrip(data, cols):
    from distributed_computing_projects_spark.sources import pdfobj as PO

    data = data[: len(data) - (len(data) % cols)]
    diffed = bytearray()
    for r in range(0, len(data), cols):
        prev = 0
        for byte in data[r:r + cols]:
            diffed.append((byte - prev) & 0xFF)
            prev = byte
    parms = {"Predictor": 2, "Columns": cols}
    assert PO._apply_predictor(bytes(diffed), parms) == data
