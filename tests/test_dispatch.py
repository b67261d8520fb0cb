"""K4 outbound send: the drain -> dispatch -> bounded sync-await lifecycle
(reference src/signal/send.rs:22-93) with a test-doubled transport."""

from __future__ import annotations

import json

import pytest

from signal_messenger_vector_database_spark.operators.dispatch import (
    SYNC_AWAIT_S,
    SYNC_MARKER,
    DispatchError,
    MessageDispatcher,
    await_sync,
    render_payloads,
    send_with_sync_barrier,
)

SF = "/root/testdata/sf0.001"


def _outbound(spark):
    return spark.createDataFrame(
        [
            ("uuid-aa", None, "hello contact"),
            (None, "groupkey-bb", "hello group"),
        ],
        "recipient_uuid string, group_key string, body string",
    )


def test_render_payloads_endpoint_arms_and_timestamp(spark):
    rows = {
        json.loads(r["payload"])["recipient"]: json.loads(r["payload"])
        for r in render_payloads(_outbound(spark), 1723500000000).collect()
    }
    assert rows["uuid-aa"]["endpoint"] == "contact"
    assert rows["groupkey-bb"]["endpoint"] == "group"
    # ONE timestamp per send() call, stamped on every message (send.rs:29-37)
    assert {p["timestamp"] for p in rows.values()} == {1723500000000}


def test_dispatcher_requires_transport():
    with pytest.raises(DispatchError, match="no transport"):
        MessageDispatcher().dispatch({"endpoint": "contact"})


def test_dispatcher_retries_with_backoff_then_succeeds():
    calls, naps = [], []

    def flaky(payload):
        calls.append(payload)
        if len(calls) < 3:
            raise ConnectionError("transient")
        return {"ok": True}

    d = MessageDispatcher(transport=flaky, backoff_s=0.5, sleep=naps.append)
    assert d.dispatch({"m": 1}) == {"ok": True}
    assert len(calls) == 3 and d.sent == [{"m": 1}]
    assert naps == [0.5, 1.0]  # exponential


def test_dispatcher_raises_after_max_retries():
    def dead(payload):
        raise ConnectionError("down")

    d = MessageDispatcher(transport=dead, sleep=lambda s: None)
    with pytest.raises(DispatchError, match="after 3 attempts"):
        d.dispatch({"m": 1})
    assert d.sent == []


def test_await_sync_ignores_non_contacts_then_returns():
    feed = iter(["content", "content", SYNC_MARKER])
    await_sync(lambda: next(feed), timeout_s=5, sleep=lambda s: None)


def test_await_sync_bounded_at_60s_contract():
    # the reference pins the barrier at 60 s (send.rs:82); a fake clock
    # proves the deadline fires and raises, with no real sleeping
    assert SYNC_AWAIT_S == 60
    t = {"now": 0.0}

    def clock():
        return t["now"]

    def sleep(s):
        t["now"] += s

    with pytest.raises(TimeoutError, match="60"):
        await_sync(lambda: "content", sleep=sleep, clock=clock, poll_s=1.0)
    assert t["now"] >= 60


def test_send_lifecycle_is_drain_then_dispatch_then_sync(spark):
    order = []

    def drain(s, sf):
        order.append("drain")
        return s.range(7)

    def transport(payload):
        order.append(("send", payload["endpoint"]))
        return {"ok": True}

    syncs = iter(["content", SYNC_MARKER])

    def probe():
        order.append("sync-poll")
        return next(syncs)

    d = MessageDispatcher(transport=transport)
    out = send_with_sync_barrier(
        spark,
        SF,
        _outbound(spark),
        d,
        probe,
        timestamp_ms=1723500000000,
        drain=drain,
        sleep=lambda s: None,
    )
    assert out == {"drained": 7, "sent": 2}
    # strict phase ordering: drain strictly precedes every dispatch,
    # every dispatch strictly precedes the sync barrier polls
    assert order[0] == "drain"
    sends = [i for i, o in enumerate(order) if isinstance(o, tuple)]
    polls = [i for i, o in enumerate(order) if o == "sync-poll"]
    assert len(sends) == 2 and {order[i][1] for i in sends} == {"contact", "group"}
    assert max(sends) < min(polls)
    assert sorted(p["recipient"] for p in d.sent) == ["groupkey-bb", "uuid-aa"]


def test_send_lifecycle_real_drain_composes(spark):
    """The default drain is the S2 AvailableNow ingest drain — run the
    lifecycle end-to-end against the real events stream once."""
    d = MessageDispatcher(transport=lambda p: {"ok": True})
    out = send_with_sync_barrier(
        spark,
        SF,
        _outbound(spark),
        d,
        iter([SYNC_MARKER]).__next__,
        timestamp_ms=1,
        sleep=lambda s: None,
    )
    assert out["sent"] == 2 and out["drained"] > 0


def test_dispatch_checkpoint_prevents_redelivery(spark):
    """K4 delivery semantics: foreachBatch + checkpoint gives exactly-once
    EFFECT per staged batch — draining the same source again against the
    SAME checkpoint dispatches nothing new, so a restarted sender does not
    double-send. (Within an in-flight batch the contract is at-least-once;
    the transport must tolerate replays of an uncommitted batch.)"""
    import tempfile
    import uuid as _uuid

    from signal_messenger_vector_database_spark.operators.dispatch import (
        foreach_batch_dispatch,
    )
    from signal_messenger_vector_database_spark.streaming.ingest import (
        await_drained,
        streaming_session,
    )

    s = streaming_session(spark)
    out = _outbound(spark)
    stage = tempfile.mkdtemp(prefix="smvd-redeliver-") + "/batch"
    out.write.mode("overwrite").parquet(stage)
    ckpt = tempfile.mkdtemp(prefix="smvd-ckpt-redeliver-")
    d = MessageDispatcher(transport=lambda p: {"ok": True})

    def drain_once():
        q = (
            s.readStream.schema(out.schema)
            .parquet(stage)
            .writeStream.foreachBatch(foreach_batch_dispatch(d, 1))
            .option("checkpointLocation", ckpt)
            .queryName(f"redeliver_{_uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .start()
        )
        await_drained(q)

    drain_once()
    assert len(d.sent) == 2
    drain_once()  # same checkpoint, no new files => nothing re-dispatched
    assert len(d.sent) == 2
