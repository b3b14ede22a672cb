"""mbox parsing unit tests: postmark splitting, mboxrd unescaping,
header extraction, headers-only messages, and the no-Python plan pin."""

from kgforge.sources.mbox import parse_mbox


def _df(spark, docs):
    return spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "box long, mbox string"
    )


_DOC = (
    "From alice@example.com Thu Jan  1 00:00:01 2024\n"
    "From: Alice <alice@example.com>\n"
    "To: bob@example.com\n"
    "Subject: hi there\n"
    "\n"
    "line one\n"
    ">From the body escaped\n"
    "\n"
    "From bob@example.com Thu Jan  2 00:00:01 2024\n"
    "Subject: re: hi\n"
    "Message-ID: <m2@x>\n"
)


def test_parse_mbox_messages_headers_and_unescape(spark):
    rows = sorted(
        parse_mbox(_df(spark, [_DOC]), "mbox", ["box"]).collect(),
        key=lambda r: r.msg_index,
    )
    assert len(rows) == 2
    m0, m1 = rows
    assert m0.from_line.startswith("alice@example.com ")
    assert m0.hdr_from == "Alice <alice@example.com>"
    assert m0.hdr_to == "bob@example.com"
    assert m0.hdr_subject == "hi there"
    assert m0.hdr_message_id is None
    # mboxrd unescape inside the body, and ONLY at line starts
    assert m0.body == "line one\nFrom the body escaped\n"
    # headers-only message: body NULL, headers still parsed
    assert m1.hdr_subject == "re: hi"
    assert m1.hdr_message_id == "<m2@x>"
    assert m1.body is None


def test_parse_mbox_body_mentions_of_headers_not_extracted(spark):
    doc = (
        "From x@y Thu Jan  1 00:00:00 2024\n"
        "Subject: real\n"
        "\n"
        "Subject: fake (this is body text)\n"
    )
    row = parse_mbox(_df(spark, [doc])).collect()[0]
    assert row.hdr_subject == "real"
    assert "fake" in row.body


def test_parse_mbox_plan_pure_expressions(spark):
    plan = (
        parse_mbox(_df(spark, [_DOC]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan
