#!/usr/bin/env python
"""Summarize a jax.profiler xplane.pb: per-op device time, no TF required.

The tunneled platform's perfetto trace (`*.trace.json.gz`) only carries
host-python events (the 1M-event cap is consumed by the host trace), so the
device timeline must be read from the XSpace proto (`*.xplane.pb`).  No
xplane proto bindings ship in this image (tensorboard-plugin-profile 2.13
has no xplane_pb2), so this decodes the few fields it needs straight from
the protobuf wire format:

  XSpace{ planes=1 } -> XPlane{ name=2, lines=3, event_metadata=4 }
  XLine{ name=2, events=4 } -> XEvent{ metadata_id=1, duration_ps=3 }
  event_metadata map entry -> XEventMetadata{ id=1, name=2, display_name=3 }

Usage: python tools/xplane_summary.py PATH/TO/*.xplane.pb [--top N]
       [--plane SUBSTR (default 'TPU')] [--group] [--line SUBSTR]

--group folds XLA op names to their fusion family (text before the first
'.'), which is usually enough to see where a training step's time goes.
"""

from __future__ import annotations

import argparse
import collections
import re


def _decode_varint(buf: memoryview, i: int):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def iter_fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over one message's wire data.
    value is a memoryview for length-delimited fields, an int otherwise."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _decode_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:                       # varint
            val, i = _decode_varint(buf, i)
        elif wt == 1:                     # fixed64
            val = int.from_bytes(buf[i:i + 8], 'little')
            i += 8
        elif wt == 2:                     # length-delimited
            ln, i = _decode_varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:                     # fixed32
            val = int.from_bytes(buf[i:i + 4], 'little')
            i += 4
        else:
            raise ValueError(f'unsupported wire type {wt}')
        yield field, wt, val


def _parse_event_metadata(buf: memoryview):
    """map<int64, XEventMetadata> entry -> (id, name)."""
    key, name, display = None, b'', b''
    for field, _, val in iter_fields(buf):
        if field == 1:
            key = val
        elif field == 2:                  # XEventMetadata submessage
            for f2, _, v2 in iter_fields(val):
                if f2 == 1:
                    key = v2 if key is None else key
                elif f2 == 2:
                    name = bytes(v2)
                elif f2 == 3:
                    display = bytes(v2)
    return key, (display or name).decode('utf-8', 'replace')


def summarize_plane(plane_buf: memoryview, line_filter: str = ''):
    """-> (plane_name, {line_name: Counter{op_name: total_ps}})."""
    plane_name = ''
    metadata = {}
    lines = []                            # (line_name, [(mid, dur_ps)])
    for field, _, val in iter_fields(plane_buf):
        if field == 2:
            plane_name = bytes(val).decode('utf-8', 'replace')
        elif field == 4:
            mid, name = _parse_event_metadata(val)
            if mid is not None:
                metadata[mid] = name
        elif field == 3:                  # XLine
            line_name, events = '', []
            for f2, _, v2 in iter_fields(val):
                if f2 == 2:
                    line_name = bytes(v2).decode('utf-8', 'replace')
                elif f2 == 4:             # XEvent
                    mid, dur = 0, 0
                    for f3, _, v3 in iter_fields(v2):
                        if f3 == 1:
                            mid = v3
                        elif f3 == 3:
                            dur = v3
                    events.append((mid, dur))
            lines.append((line_name, events))

    per_line = {}
    for line_name, events in lines:
        if line_filter and line_filter not in line_name:
            continue
        agg = collections.Counter()
        cnt = collections.Counter()
        for mid, dur in events:
            name = metadata.get(mid, f'#{mid}')
            agg[name] += dur
            cnt[name] += 1
        if agg:
            per_line[line_name] = (agg, cnt)
    return plane_name, per_line


_GROUP_RE = re.compile(r'^([^.]*)')


def group_name(op: str) -> str:
    return _GROUP_RE.match(op).group(1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('path')
    ap.add_argument('--top', type=int, default=30)
    ap.add_argument('--plane', default='TPU')
    ap.add_argument('--line', default='')
    ap.add_argument('--group', action='store_true',
                    help='fold ops to their fusion-family prefix')
    args = ap.parse_args()

    data = memoryview(bytearray(open(args.path, 'rb').read()))
    for field, _, val in iter_fields(data):
        if field != 1:
            continue
        name, per_line = summarize_plane(val, args.line)
        if args.plane not in name:
            continue
        print(f'== plane {name!r}')
        for line_name, (agg, cnt) in per_line.items():
            total_ms = sum(agg.values()) / 1e9
            print(f'-- line {line_name!r}: {len(agg)} distinct ops, '
                  f'{total_ms:.2f} ms total')
            if args.group:
                g = collections.Counter()
                gc = collections.Counter()
                for op, ps in agg.items():
                    g[group_name(op)] += ps
                    gc[group_name(op)] += cnt[op]
                agg, cnt = g, gc
            for op, ps in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
                print(f'   {ps / 1e9:10.3f} ms  x{cnt[op]:<6d} {op[:95]}')


if __name__ == '__main__':
    main()
