"""Minimal XSpace (jax.profiler xplane.pb) reader.

The image's tensorboard-profile converter bindings are broken, so this
parses the protobuf wire format directly — just enough schema to
aggregate device-op durations:

  XSpace.planes=1 -> XPlane{name=2, lines=3, event_metadata=4}
  XLine{name=2, events=4} -> XEvent{metadata_id=1, duration_ps=3}
  XEventMetadata map entry {key=1, value=2} -> {id=1, name=2}

Extends the reference's observability story (SURVEY.md §5: wall-clock
only) with real per-op device profiles.
"""


def _varint(buf, i):
    x = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x, i
        shift += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield field, wt, v


def _parse_event(buf):
    mid = dur = 0
    for f, wt, v in _fields(buf):
        if f == 1:
            mid = v
        elif f == 3:
            dur = v
    return mid, dur


def _parse_line(buf):
    events = []
    for f, wt, v in _fields(buf):
        if f == 4:
            events.append(_parse_event(v))
    return events


def _parse_meta_entry(buf):
    key = 0
    name = ""
    for f, wt, v in _fields(buf):
        if f == 1:
            key = v
        elif f == 2:  # XEventMetadata
            for f2, wt2, v2 in _fields(v):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


def op_totals(path, plane_filter=None, with_counts=False):
    """{plane_name: {op_name: total_duration_ps}} from an xplane.pb.

    with_counts=True returns {plane: {op: (total_ps, n_events)}} — each
    XEvent is one op occurrence, so n_events / steps = executions per step
    (loop-body ops inside lax.scan show their real trip counts here).
    """
    with open(path, "rb") as fh:
        buf = fh.read()
    out = {}
    for f, wt, v in _fields(buf):
        if f != 1:
            continue
        name = ""
        lines = []
        meta = {}
        for f2, wt2, v2 in _fields(v):
            if f2 == 2:
                name = v2.decode("utf-8", "replace")
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:
                k, nm = _parse_meta_entry(v2)
                meta[k] = nm
        if plane_filter and plane_filter not in name:
            continue
        totals = {}
        for lb in lines:
            for mid, dur in _parse_line(lb):
                nm = meta.get(mid, f"#{mid}")
                t, c = totals.get(nm, (0, 0))
                totals[nm] = (t + dur, c + 1)
        if totals:
            out[name] = totals if with_counts else {
                k: t for k, (t, c) in totals.items()}
    return out


def summarize(path, plane_filter="TPU", top=25, steps=1):
    """Pretty top-op table; returns [(name, ms_per_step, pct)]."""
    planes = op_totals(path, None)
    # prefer device planes
    chosen = {n: t for n, t in planes.items()
              if plane_filter.lower() in n.lower()}
    if not chosen:
        chosen = planes
    rows = []
    for pname, totals in chosen.items():
        tot = sum(totals.values()) or 1
        for nm, d in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            rows.append((f"[{pname}] {nm}", d / 1e9 / steps,
                         100.0 * d / tot))
    return rows
