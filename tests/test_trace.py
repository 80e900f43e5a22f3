"""Tests for the runtime tracing subsystem (tpgsd.utils.trace)."""

import json

import numpy

import tpgsd.fl
from tpgsd.utils.trace import get_tracer


def test_trace_records_io_events(tmp_path):
    tracer = get_tracer()
    tracer.enable(keep_events=True)
    tracer.events.clear()
    try:
        path = tmp_path / "traced.gsd"
        with tpgsd.fl.open(
            path, "w", application="t", schema="none", schema_version=[1, 0]
        ) as f:
            f.write_chunk("big", numpy.zeros(100000, numpy.float64))
            f.end_frame()
        with tpgsd.fl.open(path, "r") as f:
            f.read_chunk(0, "big")
    finally:
        tracer.disable()

    kinds = [e["kind"] for e in tracer.events]
    assert "write_chunk" in kinds
    assert "flush" in kinds
    assert "read_chunk" in kinds
    wc = next(e for e in tracer.events if e["kind"] == "write_chunk")
    assert wc["bytes"] == 800000
    assert wc["name"] == "big"
    assert wc["seconds"] >= 0
    rc = next(e for e in tracer.events if e["kind"] == "read_chunk")
    assert rc["bytes"] == 800000


def test_trace_jsonl_sink(tmp_path):
    tracer = get_tracer()
    log = tmp_path / "trace.jsonl"
    tracer.enable(str(log))
    try:
        tracer.record("custom", foo=1)
    finally:
        tracer.disable()
    lines = log.read_text().strip().splitlines()
    evt = json.loads(lines[-1])
    assert evt["kind"] == "custom" and evt["foo"] == 1 and "t" in evt


def test_trace_disabled_is_noop(tmp_path):
    tracer = get_tracer()
    assert not tracer.enabled
    tracer.record("ignored")
    with tracer.span("ignored2"):
        pass
    assert not any(e["kind"].startswith("ignored") for e in tracer.events)
