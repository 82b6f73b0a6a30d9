"""Round-7 pin: mine_sft_pairs' reversed-order growing window frame
(DESC, unboundedPreceding..-1) equals the forward (1..unboundedFollowing)
frame it replaced — identical "next assistant / next user" semantics."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_import_spark.operators.conversations import mine_sft_pairs


def _forward_frame(df, conv_col="conv_id", order_col="turn_idx",
                   role_col="role", text_col="text"):
    w_fol = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    role = F.col(role_col)
    aug = df.select(
        conv_col, order_col, role_col, text_col,
        F.min(F.when(role == "assistant", F.col(order_col))).over(w_fol).alias("response_idx"),
        F.min(F.when(role == "user", F.col(order_col))).over(w_fol).alias("_next_user_idx"),
    )
    users = aug.where(
        (role == "user")
        & F.col("response_idx").isNotNull()
        & (F.col("_next_user_idx").isNull() | (F.col("response_idx") < F.col("_next_user_idx")))
    )
    asst = df.where(role == "assistant").select(
        conv_col, F.col(order_col).alias("response_idx"), F.col(text_col).alias("response")
    )
    return users.join(asst, [conv_col, "response_idx"]).select(
        conv_col, F.col(order_col).alias("prompt_idx"), "response_idx",
        F.col(text_col).alias("prompt"), "response",
        F.length(text_col).cast("int").alias("prompt_chars"),
        F.length("response").cast("int").alias("response_chars"),
    )


def test_reversed_frame_matches_forward(spark):
    rows = [
        # c1: user -> tool -> assistant (pair crosses the tool turn)
        ("c1", 0, "user", "q1"), ("c1", 1, "tool", "t"), ("c1", 2, "assistant", "a1"),
        # c1: user -> user -> assistant (first user is superseded: no pair)
        ("c1", 3, "user", "q2"), ("c1", 4, "user", "q3"), ("c1", 5, "assistant", "a2"),
        # c1: trailing user with no assistant (no pair)
        ("c1", 6, "user", "q4"),
        # c2: assistant first, then a clean pair
        ("c2", 0, "assistant", "a0"), ("c2", 1, "user", "q5"), ("c2", 2, "assistant", "a3"),
        # c3: tools only
        ("c3", 0, "tool", "t"), ("c3", 1, "tool", "t"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    a = sorted(tuple(r) for r in _forward_frame(df).collect())
    b = sorted(tuple(r) for r in mine_sft_pairs(df).collect())
    assert a == b
    got = {(r[0], r[1], r[2]) for r in b}
    assert ("c1", 0, 2) in got       # crosses the tool turn
    assert ("c1", 4, 5) in got       # the superseding user gets the pair
    assert ("c1", 3, 5) not in got   # the superseded user does not
    assert ("c2", 1, 2) in got
    assert len(got) == 3
