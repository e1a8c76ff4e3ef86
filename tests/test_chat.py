"""Chat-template flattening: template order, role budgets, alternation
edge cases the oracle's always-alternating synthesized corpus cannot
reach."""

from __future__ import annotations

from pyspark.sql import Row

from aws_data_pipeline_ads_spark.operators import chat


def _turns(spark, rows):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_no=t, role=r, content=x)
         for c, t, r, x in rows],
        "conv_id long, turn_no int, role string, content string")


def test_flatten_orders_by_turn_and_budgets(spark):
    t = _turns(spark, [
        (1, 2, "user", "third"),
        (1, 0, "user", "first"),
        (1, 1, "assistant", "second!"),
    ])
    r = chat.flatten_conversations(t).collect()[0]
    assert r["chat_text"] == ("<|user|>first<|assistant|>second!"
                              "<|user|>third")
    assert (r["n_turns"], r["n_user_turns"], r["n_assistant_turns"]) \
        == (3, 2, 1)
    assert r["user_chars"] == len("first") + len("third")
    assert r["assistant_chars"] == len("second!")
    assert r["alternates"] is True


def test_alternation_flag_catches_malformed(spark):
    t = _turns(spark, [
        (1, 0, "user", "a"), (1, 1, "user", "b"),       # user,user: bad
        (2, 0, "assistant", "x"),                        # single turn: ok
        (3, 0, "user", "a"), (3, 1, "assistant", "b"),
        (3, 2, "user", "c"),                             # strict: ok
    ])
    got = {r["conv_id"]: r["alternates"]
           for r in chat.flatten_conversations(t).collect()}
    assert got == {1: False, 2: True, 3: True}


def test_synthesis_is_a_pure_projection(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc {i} " + "x" * 100) for i in range(9)],
        "doc_id long, text string")
    t = chat.synthesize_conversations(docs)
    rows = sorted(t.collect(), key=lambda r: (r.conv_id, r.turn_no))
    assert {r.conv_id for r in rows} == {0, 1, 2}
    assert all(len(r.content) <= chat.PREVIEW_CHARS for r in rows)
    # parity alternation holds inside every synthesized conversation
    out = chat.flatten_conversations(t)
    assert all(r["alternates"] for r in out.collect())
