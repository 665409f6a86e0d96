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


class TestDroppedKeyTombstones:
    def test_key_change_compare_with_key_dropped_from_target(self):
        """A merge-key column dropped from the LATEST target layout must
        still drive the key-change tombstone compare from its own
        per-event list — the shared trash list interleaves cells from
        every dropped column, so reading key after-images out of it
        misindexes (direct-write regression guard).  Here the target
        drops BOTH path (a key) and commit, so a trash-based compare
        would interleave path/commit cells."""
        from mysql_binlog_ray.protocol.constants import COLLATION_UTF8MB4

        tm0 = repos_table_map(False)  # repo, path, commit, lang, content
        tm1 = TableMapDef(
            table_id=tm0.table_id + 1,
            schema_name="code",
            table_name="repos",
            columns=tuple(c for c in tm0.columns if c.name not in ("path", "commit")),
            primary_key=(0,),
            schema_ver=tm0.schema_ver + 1,
        )
        r1, r2 = _mk_row(1), _mk_row(2)
        w = E.BinlogWriter()
        evs = [
            w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body()),
            w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm0)),
            # one UPDATE event, two rows: row 0 keeps its key (but
            # changes commit — a trash-interleaved compare would see the
            # commit cell), row 1 changes its path
            w.packet(
                EventType.UPDATE_ROWS_V2,
                E.encode_rows_body(
                    tm0,
                    [
                        {"before": r1, "after": {**r1, "commit": "d" * 40}},
                        {"before": r2, "after": {**r2, "path": "moved.py"}},
                    ],
                    "update",
                ),
            ),
        ]
        dec = BinlogDecoder(
            registry_snapshot=[tm0.to_dict(), tm1.to_dict()],
            output="flat",
            key_cols=("repo", "path"),
        )
        out = dec(_batch(evs))
        # 2 update rows + exactly ONE tombstone (row 1's key changed)
        assert out.column("op").to_pylist() == ["update", "update", "delete"]
        assert out.column("row_seq").to_pylist() == [0, 1, 1]
        # the tombstone carries the OLD key's surviving target column
        assert out.column("repo").to_pylist()[2] == r2["repo"]


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


@pytest.mark.usefixtures("ray_session")
class TestReviewFindings:
    """Regression tests for the round-2 self-review findings."""

    def _two_block_stream(self, gtid_seq, xid_val):
        """One transaction split across two blocks: block 1 carries
        FD/GTID/TABLE_MAP + first rows, block 2 the rest + XID."""
        from mysql_binlog_ray.fixtures.generator import repos_table_map
        from mysql_binlog_ray.protocol import encode as E
        from mysql_binlog_ray.protocol.constants import EventType
        from mysql_binlog_ray.protocol.encode import BinlogWriter

        tm = repos_table_map(False)
        w = BinlogWriter(server_id=1)

        def row(i):
            return {
                "repo": f"org0/r{i}", "path": f"f{i}.py", "commit": "c" * 40,
                "lang": "py", "content": f"body {i}",
            }

        evs1 = [
            w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body(), 1),
            w.packet(EventType.MARIA_GTID, E.encode_gtid_body(gtid_seq), 1),
            w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm), 1),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm, [row(1)], "insert"), 1),
        ]
        evs2 = [
            w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body(), 1),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm, [row(2)], "insert"), 1),
            w.packet(EventType.XID, E.encode_xid_body(xid_val)),
        ]

        def block(events, eseq0):
            return pa.table(
                {
                    "shard_id": pa.array([0] * len(events), pa.int32()),
                    "event_seq": pa.array(list(range(eseq0, eseq0 + len(events))), pa.int64()),
                    "payload": pa.array(events, pa.binary()),
                }
            )

        return tm, block(evs1, 1), block(evs2, 10)

    def test_one_transaction_one_commit_id_in_block(self):
        """A transaction fully inside one block must carry ONE commit id
        (the XID value), even when GTID seqno != XID."""
        from mysql_binlog_ray.fixtures.generator import repos_table_map
        from mysql_binlog_ray.protocol import encode as E
        from mysql_binlog_ray.protocol.constants import EventType
        from mysql_binlog_ray.protocol.encode import BinlogWriter

        tm = repos_table_map(False)
        w = BinlogWriter(server_id=1)
        row = {"repo": "a/b", "path": "p", "commit": "c" * 40, "lang": "py", "content": "x"}
        evs = [
            w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body(), 1),
            w.packet(EventType.MARIA_GTID, E.encode_gtid_body(100), 1),
            w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm), 1),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm, [row], "insert"), 1),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm, [row], "insert"), 1),
            w.packet(EventType.XID, E.encode_xid_body(5555)),
        ]
        t = pa.table(
            {
                "shard_id": pa.array([0] * len(evs), pa.int32()),
                "event_seq": pa.array(list(range(1, len(evs) + 1)), pa.int64()),
                "payload": pa.array(evs, pa.binary()),
            }
        )
        dec = BinlogDecoder(registry_snapshot=[tm.to_dict()], target_table=("code", "repos"))
        out = dec(t)
        assert set(out.column("commit_seq").to_pylist()) == {5555}

    def test_commit_source_strict_modes(self):
        """Strict domains: 'xid' leaves GTID-only tails -1; 'gtid' uses
        seqnos and leaves XID-only heads -1 — never a mixed domain."""
        tm, b1, b2 = self._two_block_stream(gtid_seq=100, xid_val=5555)
        for source, exp1, exp2 in [
            ("xid", -1, 5555),
            ("gtid", 100, -1),
            ("hybrid", 100, 5555),  # documented cross-block mix when gtid != xid
        ]:
            dec = BinlogDecoder(
                registry_snapshot=[tm.to_dict()],
                target_table=("code", "repos"),
                commit_source=source,
            )
            c1 = dec(b1).column("commit_seq").to_pylist()
            c2 = dec(b2).column("commit_seq").to_pylist()
            assert c1 == [exp1] and c2 == [exp2], (source, c1, c2)

    def test_json_mode_filter_applies_without_inband_map(self):
        """Excluded tables must stay excluded even when their TABLE_MAP
        fell in a previous block (snapshot resolution path)."""
        from mysql_binlog_ray.fixtures.generator import repos_table_map
        from mysql_binlog_ray.protocol import encode as E
        from mysql_binlog_ray.protocol.constants import EventType
        from mysql_binlog_ray.protocol.encode import BinlogWriter

        tm = repos_table_map(False)
        w = BinlogWriter(server_id=1)
        row = {"repo": "a/b", "path": "p", "commit": "c" * 40, "lang": "py", "content": "x"}
        # block with rows but NO table map: decoder must fall back to the
        # snapshot AND apply the exclude filter from there
        evs = [
            w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body(), 1),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm, [row], "insert"), 1),
            w.packet(EventType.XID, E.encode_xid_body(7)),
        ]
        t = pa.table(
            {
                "shard_id": pa.array([0] * len(evs), pa.int32()),
                "event_seq": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array(evs, pa.binary()),
            }
        )
        for kwargs in [
            dict(output="json", exclude_databases=["code"]),
            dict(output="json", exclude_tables=["code.repos"]),
        ]:
            dec = BinlogDecoder(registry_snapshot=[tm.to_dict()], **kwargs)
            assert dec(t).num_rows == 0, kwargs
        # targeted paths too
        dec = BinlogDecoder(
            registry_snapshot=[tm.to_dict()],
            target_table=("code", "repos"),
            exclude_tables=["code.repos"],
        )
        assert dec(t).num_rows == 0
        # sanity: without the filter the row decodes
        dec = BinlogDecoder(registry_snapshot=[tm.to_dict()], output="json")
        assert dec(t).num_rows == 1

    def test_repair_does_not_steal_next_files_xid(self, tmp_path):
        """A truncated-tail transaction (XID lost) must stay -1 under
        exact_commits, not get the next file's first XID."""
        import json

        import ray.data as rd

        from mysql_binlog_ray.fixtures.generator import StreamSpec, generate_stream
        from mysql_binlog_ray.pipelines.cdc import CdcConfig, decode_changefeed
        import pyarrow.parquet as pq

        spec = StreamSpec(n_keys=60, n_ops=300, n_shards=2, include_noise_events=False)
        manifest = generate_stream(spec, str(tmp_path / "stream"))
        # drop shard 0's trailing XID (simulated crash mid-write)
        p0 = manifest["shards"][0]["path"]
        t = pq.read_table(p0)
        payloads = t.column("payload").to_pylist()
        xid_idx = [i for i, p in enumerate(payloads) if p[5] == 0x10]
        cut = xid_idx[-1]
        t2 = t.take(list(range(cut)) + list(range(cut + 1, t.num_rows)))
        p0b = str(tmp_path / "shard0-truncated.parquet")
        pq.write_table(t2, p0b)
        manifest = json.loads(json.dumps(manifest))
        manifest["shards"][0]["path"] = p0b

        paths = [s["path"] for s in manifest["shards"]]
        events = rd.read_parquet(paths, override_num_blocks=16)
        cf = decode_changefeed(
            events, manifest["table_maps"], CdcConfig(), exact_commits=True
        ).to_pandas()
        # the orphaned transaction's rows stay -1 (honest unknown)...
        orphans = cf[cf["commit_seq"] == -1]
        assert len(orphans) > 0
        # ...and every orphan belongs to shard 0's seq window, i.e. no
        # shard-0 row was stamped with a shard-1 XID
        s1_first = manifest["shards"][1]["first_event_seq"]
        assert (orphans["event_seq"] < s1_first).all()
        stamped = cf[cf["commit_seq"] != -1]
        s0_rows = stamped[stamped["event_seq"] < s1_first]
        s1_xids = set()
        for p in pq.read_table(manifest["shards"][1]["path"]).column("payload").to_pylist():
            if p[5] == 0x10:
                import struct as _struct
                s1_xids.add(_struct.unpack_from("<Q", p, 20)[0])
        assert not (set(s0_rows["commit_seq"]) & s1_xids)


@pytest.mark.usefixtures("ray_session")
class TestXidFence:
    def test_gtid_group_without_xid_stays_unknown(self):
        """A GTID-delimited group whose XID is absent (non-transactional
        statement / truncated commit) must keep commit_seq = -1 in 'xid'
        mode — never the NEXT transaction's XID."""
        from mysql_binlog_ray.fixtures.generator import repos_table_map
        from mysql_binlog_ray.protocol import encode as E
        from mysql_binlog_ray.protocol.constants import EventType
        from mysql_binlog_ray.protocol.encode import BinlogWriter

        tm = repos_table_map(False)
        w = BinlogWriter(server_id=1)

        def row(i):
            return {"repo": f"a/r{i}", "path": f"p{i}", "commit": "c" * 40, "lang": "py", "content": "x"}

        evs = [
            w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body(), 1),
            w.packet(EventType.MARIA_GTID, E.encode_gtid_body(100), 1),
            w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm), 1),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm, [row(1)], "insert"), 1),
            # no XID for the first group
            w.packet(EventType.MARIA_GTID, E.encode_gtid_body(101), 1),
            w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm), 1),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm, [row(2)], "insert"), 1),
            w.packet(EventType.XID, E.encode_xid_body(5555)),
        ]
        t = pa.table(
            {
                "shard_id": pa.array([0] * len(evs), pa.int32()),
                "event_seq": pa.array(list(range(1, len(evs) + 1)), pa.int64()),
                "payload": pa.array(evs, pa.binary()),
            }
        )
        dec = BinlogDecoder(
            registry_snapshot=[tm.to_dict()],
            target_table=("code", "repos"),
            commit_source="xid",
        )
        out = dec(t)
        assert out.column("commit_seq").to_pylist() == [-1, 5555]

    def test_rotate_closes_open_transaction(self):
        """Rows before an in-block ROTATE must not be stamped by the next
        file's first XID."""
        from mysql_binlog_ray.fixtures.generator import repos_table_map
        from mysql_binlog_ray.protocol import encode as E
        from mysql_binlog_ray.protocol.constants import EventType
        from mysql_binlog_ray.protocol.encode import BinlogWriter

        tm = repos_table_map(False)
        w = BinlogWriter(server_id=1)
        row = {"repo": "a/b", "path": "p", "commit": "c" * 40, "lang": "py", "content": "x"}
        evs = [
            w.packet(EventType.FORMAT_DESCRIPTION, E.encode_format_description_body(), 1),
            w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm), 1),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm, [row], "insert"), 1),
            # file ends mid-transaction (XID lost); next file begins
            w.rotate("binlog.000002", timestamp=2),
            w.packet(EventType.TABLE_MAP, E.encode_table_map_body(tm), 2),
            w.packet(EventType.WRITE_ROWS_V2, E.encode_rows_body(tm, [row], "insert"), 2),
            w.packet(EventType.XID, E.encode_xid_body(777)),
        ]
        t = pa.table(
            {
                "shard_id": pa.array([0] * len(evs), pa.int32()),
                "event_seq": pa.array(list(range(1, len(evs) + 1)), pa.int64()),
                "payload": pa.array(evs, pa.binary()),
            }
        )
        dec = BinlogDecoder(registry_snapshot=[tm.to_dict()], target_table=("code", "repos"))
        out = dec(t)
        assert out.column("commit_seq").to_pylist() == [-1, 777]
