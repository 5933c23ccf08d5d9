// Cross-SDK SESSION conformance: session_golden.jsonl holds the exact
// frame bytes a scripted NetClient (Scala, BSON mode) session exchanged
// with a live GraftServer — recorded by graft.engine.SessionGoldenGen
// and re-pinned by SessionGoldenSpec on every sbt run. This test, run
// wherever a Go toolchain exists, replays the SERVER side of that
// transcript against this client: every request frame the Go client
// emits must byte-match the recorded Scala client's (canonical
// sorted-key encoding makes that deterministic — see bsonEncode), and
// the recorded server responses must decode into the right API results
// (rows with timestamp pairs, prepared ids, meta lists, schema).
//
// The script MUST stay in lockstep with SessionGolden.script
// (src/test/scala/graft/engine/SessionGoldenSpec.scala): same calls,
// same order, so tickets and prepared ids line up frame-for-frame.
package graftclient

import (
	"bufio"
	"bytes"
	"encoding/binary"
	"encoding/hex"
	"encoding/json"
	"io"
	"net"
	"os"
	"reflect"
	"strconv"
	"testing"
	"time"
)

type sessionFrame struct {
	Seq int    `json:"seq"`
	Dir string `json:"dir"`
	Hex string `json:"hex"`
}

func loadSessionGolden(t *testing.T) []sessionFrame {
	f, err := os.Open("session_golden.jsonl")
	if err != nil {
		t.Fatalf("missing golden file: %v", err)
	}
	defer f.Close()
	var frames []sessionFrame
	sc := bufio.NewScanner(f)
	for sc.Scan() {
		line := bytes.TrimSpace(sc.Bytes())
		if len(line) == 0 {
			continue
		}
		var fr sessionFrame
		if err := json.Unmarshal(line, &fr); err != nil {
			t.Fatalf("bad golden line %q: %v", line, err)
		}
		frames = append(frames, fr)
	}
	return frames
}

// fakeServer replays the transcript's server side on one accepted
// connection: reads and byte-verifies each c2s frame, writes each s2c
// frame, in file order. Mismatches are reported through `errs`.
func fakeServer(ln net.Listener, frames []sessionFrame, errs chan<- error) {
	defer close(errs)
	conn, err := ln.Accept()
	if err != nil {
		errs <- err
		return
	}
	defer conn.Close()
	hdr := make([]byte, 4)
	for _, fr := range frames {
		want, err := hex.DecodeString(fr.Hex)
		if err != nil {
			errs <- err
			return
		}
		if fr.Dir == "c2s" {
			if _, err := io.ReadFull(conn, hdr); err != nil {
				errs <- err
				return
			}
			n := int(int32(binary.LittleEndian.Uint32(hdr)))
			body := make([]byte, n)
			if _, err := io.ReadFull(conn, body); err != nil {
				errs <- err
				return
			}
			if !bytes.Equal(body, want) {
				errs <- &frameMismatch{fr.Seq, want, body}
				return
			}
		} else {
			frame := make([]byte, 4+len(want))
			binary.LittleEndian.PutUint32(frame, uint32(len(want)))
			copy(frame[4:], want)
			if _, err := conn.Write(frame); err != nil {
				errs <- err
				return
			}
		}
	}
}

type frameMismatch struct {
	seq       int
	want, got []byte
}

func (m *frameMismatch) Error() string {
	return "frame " + strconv.Itoa(m.seq) + " drifted:\n  want " +
		hex.EncodeToString(m.want) + "\n  got  " + hex.EncodeToString(m.got)
}

func TestSessionGoldenReplay(t *testing.T) {
	frames := loadSessionGolden(t)
	if len(frames) == 0 {
		t.Fatal("empty golden transcript")
	}
	ln, err := net.Listen("tcp", "127.0.0.1:0")
	if err != nil {
		t.Fatal(err)
	}
	defer ln.Close()
	errs := make(chan error, 1)
	go fakeServer(ln, frames, errs)
	port := ln.Addr().(*net.TCPAddr).Port
	c, err := Connect("127.0.0.1", port, "")
	if err != nil {
		t.Fatal(err)
	}
	defer c.Close()

	// ── the scripted session, in lockstep with SessionGolden.script ──
	if _, err := c.Execute("create database gold"); err != nil { // t1
		t.Fatal(err)
	}
	if err := c.Use("gold"); err != nil { // t2
		t.Fatal(err)
	}
	if _, err := c.Execute("create table gold.t(sec int, tm timestamp, " +
		"px double, note text, primary key(sec, tm))"); err != nil { // t3
		t.Fatal(err)
	}
	pid, err := c.Prepare("insert into gold.t values(?, ?, ?, ?)") // t4
	if err != nil {
		t.Fatal(err)
	}
	if pid != 0 {
		t.Fatalf("prepared id drifted: %d", pid)
	}
	err = c.BatchInsert("insert into gold.t values(?, ?, ?, ?)", // t5
		[][]interface{}{
			{1, time.Unix(10, 500).UTC(), 2.5, "b"},
			{1, time.Unix(20, 0).UTC(), 3.5, "c"},
			{2, time.Unix(10, 0).UTC(), 9.0, "d"},
		})
	if err != nil {
		t.Fatal(err)
	}
	rows, err := c.Execute("select * from gold.t where sec=?", 1) // t6
	if err != nil {
		t.Fatal(err)
	}
	wantRows := [][]interface{}{
		{int64(1), time.Unix(10, 500).UTC(), 2.5, "b"},
		{int64(1), time.Unix(20, 0).UTC(), 3.5, "c"},
	}
	if !reflect.DeepEqual(rows, wantRows) {
		t.Fatalf("select decoded %#v, want %#v", rows, wantRows)
	}
	tables, err := c.ListTables() // t7
	if err != nil {
		t.Fatal(err)
	}
	if !reflect.DeepEqual(tables, []string{"_adj_", "t"}) {
		t.Fatalf("list_tables decoded %#v", tables)
	}
	ts, err := c.Schema("t") // t8
	if err != nil {
		t.Fatal(err)
	}
	wantSchema := TableSchema{
		Keys:   [][2]string{{"sec", "Int"}, {"tm", "Timestamp"}},
		Values: [][2]string{{"px", "Double"}, {"note", "Text"}},
	}
	if !reflect.DeepEqual(ts, wantSchema) {
		t.Fatalf("schema decoded %#v, want %#v", ts, wantSchema)
	}
	// ── TVF + chunked surface (round-11 verdict item 5) ──
	if _, err := c.Execute("create table gold.docs(id int, txt text, " +
		"primary key(id))"); err != nil { // t9
		t.Fatal(err)
	}
	dpid, err := c.Prepare("insert into gold.docs values(?, ?)") // t10
	if err != nil {
		t.Fatal(err)
	}
	if dpid != 1 {
		t.Fatalf("second prepared id drifted: %d", dpid)
	}
	w := ""
	for i := 1; i <= 20; i++ {
		if i > 1 {
			w += " "
		}
		w += "w" + strconv.Itoa(i)
	}
	// BatchInsert reuses the t10 prepared id from the cache, so this
	// emits exactly one run frame — in lockstep with the Scala script
	err = c.BatchInsert("insert into gold.docs values(?, ?)", // t11
		[][]interface{}{
			{1, w},
			{2, w + " wx"},
			{3, "alpha beta gamma delta epsilon zeta eta theta"},
		})
	if err != nil {
		t.Fatal(err)
	}
	// table-valued function with server-side WHERE + projection,
	// threshold placeholder-bound (BSON double)
	comp, err := c.Execute("select id from dedup_components"+
		"('gold.docs', 'id', 'txt', ?) where comp = 1", 0.5) // t12
	if err != nil {
		t.Fatal(err)
	}
	wantComp := [][]interface{}{{int64(1)}, {int64(2)}}
	if !reflect.DeepEqual(comp, wantComp) {
		t.Fatalf("TVF select decoded %#v, want %#v", comp, wantComp)
	}
	// chunked "5"-protocol: 5-key request doc (canonical sorted keys)
	// and a streamed 2-frame response for 3 rows in 2-row chunks
	chunked, err := c.ExecuteChunked("select * from gold.t where sec>=?",
		[]interface{}{1}, 2) // t13
	if err != nil {
		t.Fatal(err)
	}
	if len(chunked) != 3 {
		t.Fatalf("chunked select decoded %d rows, want 3", len(chunked))
	}
	// surface any fake-server verification failure
	if err := <-errs; err != nil {
		t.Fatal(err)
	}
}
