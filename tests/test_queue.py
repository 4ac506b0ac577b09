"""Queue layer tests: RESP client + miniredis + Stream + History
(ref internal/redis/{stream,history}.go)."""

import threading
import time

import pytest

from vcp_tpu.queue.history import HistoryManager
from vcp_tpu.queue.resp import RedisClient, RedisError
from vcp_tpu.queue.stream import (
    DEFAULT_GROUP, RateLimiter, Stream, Task)


def make_stream(addr) -> Stream:
    return Stream(addr)


def make_task(i=0) -> Task:
    return Task(
        id=f"task_{i}",
        source_ip="10.0.0.1",
        input_path=f"/shared/in_{i}.mp4",
        original_name=f"in_{i}.mp4",
        output_dir="/out",
        output_name=f"in_{i}.mp4",
        ffmpeg_args="-c copy",
        verify_output=True,
    )


def test_ping(redis_address):
    assert RedisClient(redis_address).ping()


def test_task_wire_roundtrip():
    t = make_task(3)
    fields = t.to_fields()
    # reference XADD schema (ref stream.go:125-138) + the additive
    # published_at field (dispatch-latency tracking; consumers without it
    # simply ignore the extra key)
    assert set(fields) == {"task_id", "input_path", "original_name",
                           "output_dir", "output_name", "ffmpeg_args",
                           "verify_output", "source_ip", "retry",
                           "published_at"}
    assert fields["verify_output"] == "true"
    t2 = Task.from_fields("1-1", fields)
    assert t2.id == t.id and t2.verify_output is True
    assert t2.message_id == "1-1"
    # tolerant decode of junk retry (ref stream.go:180-216)
    fields["retry"] = "zzz"
    assert Task.from_fields("1-2", fields).retry == 0
    # published_at survives the wire; junk/absent tolerated
    t.published_at = 123.5
    t2 = Task.from_fields("1-3", t.to_fields())
    assert t2.published_at == 123.5
    assert Task.from_fields("1-4", {}).published_at == 0.0


def test_publish_read_ack_cycle(redis_address):
    s = make_stream(redis_address)
    s.create_consumer_group()
    # idempotent group creation tolerates BUSYGROUP (ref stream.go:107-113)
    s.create_consumer_group()

    mid = s.publish(make_task(1))
    assert "-" in mid
    info = s.get_queue_info()
    assert info.length == 1 and info.groups == 1 and info.pending == 0

    tasks = s.read_group(DEFAULT_GROUP, "c1", count=1, block=0.2)
    assert len(tasks) == 1
    t = tasks[0]
    assert t.id == "task_1" and t.ffmpeg_args == "-c copy"
    assert s.get_queue_info().pending == 1

    # same consumer re-reads its PEL (ref stream.go:162-178)
    pend = s.read_pending_tasks(DEFAULT_GROUP, "c1")
    assert [p.id for p in pend] == ["task_1"]

    # other consumer sees nothing new
    assert s.read_group(DEFAULT_GROUP, "c2", count=1, block=0.05) == []

    s.acknowledge(DEFAULT_GROUP, t.message_id)
    info = s.get_queue_info()
    # XACK+XDEL: message fully gone (ref stream.go:219-227)
    assert info.pending == 0 and info.length == 0


def test_blocking_read_wakes_on_publish(redis_address):
    s = make_stream(redis_address)
    s.create_consumer_group()
    got = []

    def reader():
        r = Stream(redis_address)
        got.extend(r.read_group(DEFAULT_GROUP, "blocked", block=5.0))

    th = threading.Thread(target=reader)
    th.start()
    time.sleep(0.2)
    s.publish(make_task(9))
    th.join(timeout=5)
    assert not th.is_alive()
    assert len(got) == 1 and got[0].id == "task_9"


def test_pending_and_clean(redis_address):
    s = make_stream(redis_address)
    s.create_consumer_group()
    for i in range(3):
        s.publish(make_task(i))
    s.read_group(DEFAULT_GROUP, "dead_consumer", count=3, block=0.1)
    rows = s.get_pending_tasks(DEFAULT_GROUP)
    assert len(rows) == 3
    assert all(r["consumer"] == "dead_consumer" for r in rows)
    # clean --pending semantics (ref stream.go:328-353)
    assert s.clean_pending_tasks(DEFAULT_GROUP) == 3
    assert s.get_queue_info().pending == 0
    assert s.get_queue_info().length == 0


def test_trim_and_delete(redis_address):
    s = make_stream(redis_address)
    s.create_consumer_group()
    for i in range(10):
        s.publish(make_task(i))
    assert s.trim_stream(4) == 6
    assert s.get_queue_info().length == 4
    s.delete_stream()
    assert s.get_queue_info().length == 0


def test_stream_maxlen_honored(redis_address):
    s = Stream(redis_address, max_stream_length=5)
    s.create_consumer_group()
    for i in range(12):
        s.publish(make_task(i))
    assert s.get_queue_info().length <= 5


def test_consumer_group_introspection(redis_address):
    s = make_stream(redis_address)
    s.create_consumer_group()
    s.publish(make_task(0))
    s.read_group(DEFAULT_GROUP, "c1", block=0.1)
    groups = s.get_consumer_groups()
    assert groups and groups[0]["name"] == DEFAULT_GROUP
    consumers = s.get_consumers(DEFAULT_GROUP)
    assert consumers and consumers[0]["name"] == "c1"
    assert int(consumers[0]["pending"]) == 1
    sinfo = s.get_stream_info()
    assert int(sinfo["length"]) == 1


def test_retry_republish(redis_address):
    s = make_stream(redis_address)
    s.create_consumer_group()
    s.publish(make_task(1))
    [t] = s.read_group(DEFAULT_GROUP, "c1", block=0.1)
    s.acknowledge(DEFAULT_GROUP, t.message_id)
    s.retry_task(t)
    [t2] = s.read_group(DEFAULT_GROUP, "c1", block=0.1)
    assert t2.retry == 1 and t2.id == t.id


def test_history_lifecycle(redis_address):
    c = RedisClient(redis_address)
    h = HistoryManager(c)
    h.record_task_start("t1", "a.mp4", "/shared/a.mp4", "c1", "10.0.0.1")
    rec = h.get_task_history("t1")
    assert rec is not None and rec.status == "processing"
    h.record_task_complete("t1", "/out/a.mp4", 12345)
    rec = h.get_task_history("t1")
    assert rec.status == "completed" and rec.output_size == 12345
    assert rec.duration_sec >= 0

    h.record_task_start("t2", "b.mp4", "/shared/b.mp4", "c1")
    h.record_task_failed("t2", "encode error")
    stats = h.get_stats()
    assert stats["total"] == 2
    assert stats["completed"] == 1 and stats["failed"] == 1

    # complete-without-start still persists (fixes reference quirk)
    h.record_task_complete("t3", "/out/c.mp4", 1)
    assert h.get_task_history("t3").status == "completed"


def test_delete_history(redis_address):
    c = RedisClient(redis_address)
    h = HistoryManager(c)
    for i in range(5):
        h.record_task_start(f"t{i}", "x.mp4", "/s/x.mp4", "c")
    s = make_stream(redis_address)
    assert s.delete_history() == 5
    assert h.get_task_history("t0") is None
    assert h.get_all_history() == []


def test_rate_limiter_thread_safe():
    rl = RateLimiter(1000)
    hits = []

    def worker():
        for _ in range(200):
            if rl.allow():
                hits.append(1)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # bucket starts with 1000 tokens; 1600 attempts nearly instantaneous
    assert 900 <= len(hits) <= 1100


def test_rate_limit_publish_rejects(redis_address):
    s = Stream(redis_address, publish_rate_limit=1)
    s.create_consumer_group()
    s.publish(make_task(0))  # consumes the single token
    with pytest.raises(RedisError):
        s.publish(make_task(1))


def test_miniredis_auth_enforced():
    from vcp_tpu.queue.miniredis import MiniRedisServer
    srv = MiniRedisServer(password="sekrit")
    srv.start()
    try:
        # wrong password rejected; no AUTH at all → NOAUTH
        assert not RedisClient(srv.address, password="nope").ping()
        assert not RedisClient(srv.address).ping()
        # correct password works
        assert RedisClient(srv.address, password="sekrit").ping()
    finally:
        srv.stop()


def test_miniredis_no_password_auth_errors():
    from vcp_tpu.queue.miniredis import MiniRedisServer
    srv = MiniRedisServer()
    srv.start()
    try:
        assert RedisClient(srv.address).ping()
        # AUTH when no password set is an error
        assert not RedisClient(srv.address, password="x").ping()
    finally:
        srv.stop()
