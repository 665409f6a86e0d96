"""BinlogDecoder stage tests (no Ray needed: the callable is exercised
directly on pyarrow batches, as `map_batches` would)."""

import pyarrow as pa
import pytest
import pyarrow.compute as pc

from mysql_binlog_ray.fixtures.generator import (
    StreamSpec,
    build_op_plan,
    generate_stream,
    repos_table_map,
)
from mysql_binlog_ray.protocol import encode as E
from mysql_binlog_ray.protocol.constants import ColumnType, EventType
from mysql_binlog_ray.protocol.model import ColumnDef, TableMapDef
from mysql_binlog_ray.stages.decode_stage import BinlogDecoder


def _batch(payloads, shard=0, seq0=1):
    return pa.table(
        {
            "shard_id": pa.array([shard] * len(payloads), pa.int32()),
            "event_seq": pa.array(range(seq0, seq0 + len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _simple_stream(tm, rows_events):
    w = E.BinlogWriter()
    out = [w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body())]
    out.append(w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm)))
    for op, rows in rows_events:
        etype = {
            "insert": EventType.WRITE_ROWS_V2,
            "update": EventType.UPDATE_ROWS_V2,
            "delete": EventType.DELETE_ROWS_V2,
        }[op]
        out.append(w.packet(etype, E.encode_rows_body(tm, rows, op)))
    out.append(w.packet(EventType.XID, E.encode_xid_body(99)))
    return out


TM = repos_table_map(False)


def _mk_row(i):
    return {
        "repo": f"org0/repo{i}",
        "path": f"a/b{i}.py",
        "commit": "c" * 40,
        "lang": "py",
        "content": f"content {i}",
    }


class TestDecoderBasics:
    def test_insert_update_delete_shapes(self):
        events = _simple_stream(
            TM,
            [
                ("insert", [_mk_row(1), _mk_row(2)]),
                ("update", [{"before": _mk_row(1), "after": {**_mk_row(1), "commit": "d" * 40}}]),
                ("delete", [_mk_row(2)]),
            ],
        )
        dec = BinlogDecoder(registry_snapshot=[TM.to_dict()])
        out = dec(_batch(events))
        assert out.num_rows == 4
        assert out.column("op").to_pylist() == ["insert", "insert", "update", "delete"]
        # inserts: before null; deletes: after null
        assert out.column("before").is_valid().to_pylist() == [False, False, True, True]
        assert out.column("after").is_valid().to_pylist() == [True, True, True, False]
        # commit stamped from the XID inside the batch (M4)
        assert out.column("commit_seq").to_pylist() == [99, 99, 99, 99]
        # row_seq restarts per event
        assert out.column("row_seq").to_pylist() == [0, 1, 0, 0]

    def test_commit_seq_unknown_when_xid_outside_batch(self):
        events = _simple_stream(TM, [("insert", [_mk_row(1)])])[:-1]  # drop XID
        dec = BinlogDecoder(registry_snapshot=[TM.to_dict()])
        out = dec(_batch(events))
        assert out.column("commit_seq").to_pylist() == [-1]

    def test_in_band_table_map_only(self):
        """Schema discovered purely in-band (reference semantics §1.2):
        the snapshot names the target table but the layout arrives in the
        stream."""
        tm_unseen = TableMapDef(
            table_id=999,
            schema_name="code",
            table_name="repos",
            columns=TM.columns,
            primary_key=TM.primary_key,
        )
        events = _simple_stream(tm_unseen, [("insert", [_mk_row(5)])])
        dec = BinlogDecoder(registry_snapshot=[TM.to_dict()])
        out = dec(_batch(events))
        assert out.num_rows == 1
        assert out.column("table_map_id").to_pylist() == [999]

    def test_start_after_seq_skips(self):
        events = _simple_stream(TM, [("insert", [_mk_row(1)]), ("insert", [_mk_row(2)])])
        # event_seq: 1=FD, 2=TM, 3=ins, 4=ins, 5=XID
        dec = BinlogDecoder(registry_snapshot=[TM.to_dict()], start_after_seq=3)
        out = dec(_batch(events))
        assert out.num_rows == 1
        assert out.column("event_seq").to_pylist() == [4]

    def test_corrupt_event_dropped_not_crash(self):
        events = _simple_stream(TM, [("insert", [_mk_row(1)]), ("insert", [_mk_row(2)])])
        bad = bytearray(events[2])
        bad[40] ^= 0xFF  # flip a byte inside the first WRITE_ROWS body
        events[2] = bytes(bad)
        dec = BinlogDecoder(registry_snapshot=[TM.to_dict()])
        out = dec(_batch(events))
        assert out.num_rows == 1  # poison event skipped (E13)
        assert dec.n_checksum_failures == 1


class TestTableFilters:
    """F1 semantics (`EventsIterator.php:103-130`)."""

    def _other(self):
        return TableMapDef(
            table_id=55,
            schema_name="otherdb",
            table_name="t",
            columns=(ColumnDef("x", ColumnType.LONG),),
        )

    def test_exclude_database(self):
        dec = BinlogDecoder(
            registry_snapshot=[TM.to_dict()],
            target_table=("code", "repos"),
            exclude_databases=["code"],
        )
        out = dec(_batch(_simple_stream(TM, [("insert", [_mk_row(1)])])))
        assert out.num_rows == 0

    def test_include_tables_list(self):
        dec = BinlogDecoder(
            registry_snapshot=[TM.to_dict()],
            tables=["code.repos"],
        )
        out = dec(_batch(_simple_stream(TM, [("insert", [_mk_row(1)])])))
        assert out.num_rows == 1
        dec2 = BinlogDecoder(
            registry_snapshot=[TM.to_dict()],
            tables=["code.other"],
        )
        out2 = dec2(_batch(_simple_stream(TM, [("insert", [_mk_row(1)])])))
        assert out2.num_rows == 0

    def test_non_target_table_ignored(self):
        other = self._other()
        w = E.BinlogWriter()
        evs = [
            w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body()),
            w.packet(EventType.TABLE_MAP, E.encode_table_map_body(other)),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(other, [{"x": 1}], "insert")),
        ]
        dec = BinlogDecoder(registry_snapshot=[TM.to_dict()])
        out = dec(_batch(evs))
        assert out.num_rows == 0


class TestSchemaEvolution:
    def test_late_binding_null_fill(self):
        """Rows decoded under schema v1 surface in the v2 target schema
        with `stars` null-filled (M3 late binding)."""
        tm1, tm2 = repos_table_map(False), repos_table_map(True)
        w = E.BinlogWriter()
        r = _mk_row(1)
        evs = [
            w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body()),
            w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm1)),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm1, [r], "insert")),
            w.packet(EventType.QUERY, E.encode_query_body("code", "ALTER TABLE repos ADD COLUMN stars BIGINT")),
            w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm2)),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm2, [{**_mk_row(2), "stars": 7}], "insert")),
        ]
        dec = BinlogDecoder(registry_snapshot=[tm1.to_dict(), tm2.to_dict()])
        out = dec(_batch(evs))
        assert out.num_rows == 2
        afters = out.column("after").to_pylist()
        assert afters[0]["stars"] is None
        assert afters[1]["stars"] == 7
        assert out.column("schema_ver").to_pylist() == [1, 2]


class TestGeneratedStream:
    def test_decode_counts_match_oplog(self, tmp_path):
        spec = StreamSpec(n_keys=100, n_ops=400, n_shards=2)
        m = generate_stream(spec, str(tmp_path))
        import pyarrow.parquet as pq

        dec = BinlogDecoder(registry_snapshot=m["table_maps"])
        total = 0
        for s in m["shards"]:
            t = pq.read_table(s["path"])
            out = dec(t)
            total += out.num_rows
        assert total == spec.n_ops


class TestArrowViewSignedness:
    """Regression: pyarrow Buffer memoryviews are signed ('b'); every
    single-byte read in the decode hot path must see 0..255.  Caught by
    the typed issues table (datetime bytes >= 0x80); strings shorter than
    128 chars never trip it."""

    def test_high_bit_bytes_through_arrow_path(self):
        from mysql_binlog_ray.protocol.constants import COLLATION_UTF8MB4

        cols = (
            ColumnDef("k", ColumnType.LONG),
            ColumnDef("long_name", ColumnType.VARCHAR, max_length=255, charset=COLLATION_UTF8MB4),
            ColumnDef("dt", ColumnType.DATETIME2, fsp=0),
            ColumnDef("big", ColumnType.LONGLONG, signed=False),
        )
        tm = TableMapDef(table_id=31, schema_name="code", table_name="repos", columns=cols, primary_key=(0,))
        row = {
            "k": -1,
            "long_name": "x" * 200,  # 1-byte length prefix 200 (> 127)
            "dt": "2024-12-31 23:59:59",
            "big": (1 << 64) - 2,
        }
        w = E.BinlogWriter()
        evs = [
            w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body()),
            w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm)),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm, [row], "insert")),
        ]
        out = BinlogDecoder(registry_snapshot=[tm.to_dict()])(_batch(evs))
        got = out.column("after").to_pylist()[0]
        assert got["long_name"] == "x" * 200
        assert got["dt"] == "2024-12-31 23:59:59"
        assert got["big"] == (1 << 64) - 2
        assert got["k"] == -1


@pytest.mark.usefixtures("ray_session")
class TestMultiTableJsonDecode:
    def test_json_changefeed_covers_all_tables_and_matches_targeted(self, tmp_path):
        """One decode pass over a two-table stream must yield exactly the
        union of the two targeted decodes (row counts, seqs, and row
        images)."""
        import json

        import ray.data as rd

        from mysql_binlog_ray.fixtures.generator import StreamSpec, generate_stream
        from mysql_binlog_ray.pipelines.cdc import (
            CdcConfig,
            decode_all_tables,
            decode_changefeed,
            read_event_stream,
        )

        spec = StreamSpec(n_keys=120, n_ops=600, n_shards=2, issues_every=3)
        manifest = generate_stream(spec, str(tmp_path / "stream"))
        events = read_event_stream(manifest)
        allcf = decode_all_tables(events, manifest["table_maps"]).to_pandas()
        assert set(allcf["table_name"]) == {"repos", "issues"}

        for table, key in [("repos", ("repo", "path")), ("issues", ("issue_id",))]:
            targeted = decode_changefeed(
                read_event_stream(manifest),
                manifest["table_maps"],
                CdcConfig(target_table=("code", table)),
            ).to_pandas()
            sub = allcf[allcf["table_name"] == table]
            assert len(sub) == len(targeted)
            assert set(zip(sub["event_seq"], sub["row_seq"])) == set(
                zip(targeted["event_seq"], targeted["row_seq"])
            )
            # commit stamps identical between the two paths
            a = sub.set_index(["event_seq", "row_seq"])["commit_seq"]
            b = targeted.set_index(["event_seq", "row_seq"])["commit_seq"]
            assert (a.sort_index() == b.sort_index()).all()

        # spot-check row images: JSON after == targeted struct after
        sub = allcf[(allcf["table_name"] == "repos") & (allcf["op"] == "insert")].head(20)
        targeted = decode_changefeed(
            read_event_stream(manifest),
            manifest["table_maps"],
            CdcConfig(target_table=("code", "repos")),
        ).to_pandas()
        tmap = targeted.set_index(["event_seq", "row_seq"])
        for _, r in sub.iterrows():
            got = json.loads(r["after"])
            exp = tmap.loc[(r["event_seq"], r["row_seq"])]["after"]
            for k in ("repo", "path", "commit", "content"):
                assert got[k] == exp[k]
            assert r["before"] is None

    def test_json_mode_respects_filters(self, tmp_path):
        from mysql_binlog_ray.fixtures.generator import StreamSpec, generate_stream
        from mysql_binlog_ray.pipelines.cdc import (
            CdcConfig,
            decode_all_tables,
            read_event_stream,
        )

        spec = StreamSpec(n_keys=80, n_ops=400, n_shards=2, issues_every=3)
        manifest = generate_stream(spec, str(tmp_path / "stream"))
        cf = decode_all_tables(
            read_event_stream(manifest),
            manifest["table_maps"],
            CdcConfig(exclude_tables=["code.issues"]),
        ).to_pandas()
        assert set(cf["table_name"]) == {"repos"}


@pytest.mark.usefixtures("ray_session")
class TestTruncatedEvent:
    def test_truncated_tail_event_skipped_not_crash(self, small_stream):
        """A partially-written (crash-truncated) event fails CRC verify
        and is poison-skipped, like any corrupt event (E13) — the rest of
        the stream decodes."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from mysql_binlog_ray.stages.decode_stage import BinlogDecoder

        spec, out, manifest = small_stream
        t = pq.read_table(manifest["shards"][0]["path"])
        payloads = t.column("payload").to_pylist()
        # truncate the LAST rows event to half its bytes
        rows_idx = [i for i, p in enumerate(payloads) if p[5] in (0x1E, 0x1F, 0x20)]
        cut = rows_idx[-1]
        expected_lost = None
        dec0 = BinlogDecoder(registry_snapshot=manifest["table_maps"])
        full = dec0(t)
        payloads[cut] = payloads[cut][: len(payloads[cut]) // 2]
        t2 = pa.table(
            {
                "shard_id": t.column("shard_id"),
                "event_seq": t.column("event_seq"),
                "payload": pa.array(payloads, pa.binary()),
            }
        )
        dec = BinlogDecoder(registry_snapshot=manifest["table_maps"])
        got = dec(t2)
        assert dec.n_checksum_failures == 1
        assert got.num_rows < full.num_rows  # only the truncated event lost
        lost_seq = t.column("event_seq")[cut].as_py()
        remaining = set(got.column("event_seq").to_pylist())
        assert lost_seq not in remaining


@pytest.mark.usefixtures("ray_session")
class TestNoCrossBlockLeak:
    def test_inband_binding_does_not_leak_into_next_block(self):
        """Blocks are scheduled in arbitrary order across files: an
        in-band TABLE_MAP binding from one block must not survive into
        the next block (which may belong to a different file and start
        mid-transaction).  Block 2 has a rows event with NO table map —
        it must resolve against the broadcast snapshot, not block 1's
        leaked layout."""
        from mysql_binlog_ray.protocol import encode as E
        from mysql_binlog_ray.protocol.constants import COLLATION_UTF8MB4
        from mysql_binlog_ray.protocol.encode import BinlogWriter

        def tmdef(cols, ver):
            return TableMapDef(
                table_id=300, schema_name="code", table_name="repos",
                columns=tuple(cols), primary_key=(0,), schema_ver=ver,
            )

        base_cols = [
            ColumnDef("repo", ColumnType.VARCHAR, nullable=False, max_length=255, charset=COLLATION_UTF8MB4),
            ColumnDef("path", ColumnType.VARCHAR, nullable=False, max_length=255, charset=COLLATION_UTF8MB4),
        ]
        v2_cols = [ColumnDef("extra", ColumnType.LONG, nullable=True, signed=True), *base_cols]
        tm_a, tm_b = tmdef(base_cols, 1), tmdef(v2_cols, 2)

        def block(events, eseq0):
            seqs = list(range(eseq0, eseq0 + len(events)))
            return pa.table(
                {
                    "shard_id": pa.array([0] * len(events), pa.int32()),
                    "event_seq": pa.array(seqs, pa.int64()),
                    "payload": pa.array(events, pa.binary()),
                }
            )

        w = BinlogWriter(server_id=1)
        fd = w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body(), 1)
        # block 1 (file 2): binds layout B in-band and decodes with it
        blk1 = block(
            [
                fd,
                w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm_b), 2),
                w.packet(
                    EventType.WRITE_ROWS_V2,
                    E.encode_rows_body(tm_b, [{"repo": "r2", "path": "p2", "extra": 7}], "insert"),
                    2,
                ),
            ],
            1000,
        )
        # block 2 (file 1, mid-transaction): rows event only — layout A
        blk2 = block(
            [
                fd,
                w.packet(
                    EventType.WRITE_ROWS_V2,
                    E.encode_rows_body(tm_a, [{"repo": "r1", "path": "p1"}], "insert"),
                    3,
                ),
            ],
            1,
        )
        dec = BinlogDecoder(
            registry_snapshot=[tm_a.to_dict()], target_table=("code", "repos")
        )
        out1 = dec(blk1)
        assert out1.num_rows == 1  # layout B decoded via in-band map
        out2 = dec(blk2)
        got = out2.column("after").to_pylist()[0]
        # snapshot layout A applies — a leaked layout B would shift every
        # value (reading 'extra' bytes that aren't there)
        assert (got["repo"], got["path"]) == ("r1", "p1")
