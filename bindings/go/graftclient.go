// Package graftclient is a stdlib-only Go client for the graft wire
// server, mirroring the reference SDK's API shape (reference
// client/opentick.go:15-61: Connect returns a Connection with
// Execute / ExecuteAsync / BatchInsert / BatchInsertAsync / Use /
// Close; async calls return Futures with Get(timeout); SplitRange
// supports scatter-gather range queries) plus the meta helpers the
// other bindings expose.
//
// Wire format (engine/Server.scala): 4-byte little-endian length
// frames. Connect speaks BSON by default — the reference client's
// default mode — through the stdlib-only codec in bson.go (the
// reference pulls gopkg.in/mgo.v2/bson; this SDK hand-implements the
// subset from the public spec and keeps zero dependencies).
// ConnectProto(host, port, db, "json") negotiates the alternate JSON
// mode with a `protocol=json` first frame; the server treats both
// codecs as equal peers. Request {"0": ticket, "1": cmd, "2": sql or
// prepared id, "3": args, "4": useCache, "5": chunkRows}; response
// {"0": ticket, "1": result} where a string result is an error; a
// 1-byte `H` frame is a heartbeat probe answered with an empty frame.
//
// Timestamps travel as [epoch_seconds, nanos] pairs: pass time.Time
// (converted losslessly) or [2]int64 values as arguments; result
// cells holding such pairs come back as time.Time in UTC (Go's
// time.Time is nanosecond-precise, so nothing truncates).
package graftclient

import (
	"bytes"
	"encoding/binary"
	"encoding/json"
	"errors"
	"fmt"
	"io"
	"net"
	"strconv"
	"sync"
	"time"
)

// Future is a pending query result, reference opentick.go:15-17 shape.
type Future interface {
	Get(timeout ...float64) ([][]interface{}, error)
}

// Connection is the client handle, reference opentick.go:19-26 shape
// (Execute/ExecuteAsync/BatchInsert/BatchInsertAsync/Use/Close), with
// the meta/login/chunked surface of the sibling Python/C++ bindings.
type Connection interface {
	Execute(sql string, args ...interface{}) ([][]interface{}, error)
	ExecuteAsync(sql string, args ...interface{}) (Future, error)
	ExecuteChunked(sql string, args []interface{}, chunkRows int) ([][]interface{}, error)
	ExecuteRanges(sql string, parts RangeArray) ([][]interface{}, error)
	BatchInsert(sql string, argsArray [][]interface{}) error
	BatchInsertAsync(sql string, argsArray [][]interface{}) (Future, error)
	Prepare(sql string) (int, error)
	Use(dbName string) error
	Login(username, password string) error
	ListDatabases() ([]string, error)
	ListTables() ([]string, error)
	Schema(tableName string) (TableSchema, error)
	Close()
}

// RangeArray is a list of [lo, hi] scatter-gather parts
// (reference opentick.go:61).
type RangeArray [][2]interface{}

// TableSchema is the server's schema document for a table: primary-key
// columns then value columns, each as a (name, typeName) pair.
type TableSchema struct {
	Keys   [][2]string
	Values [][2]string
}

// SplitRange splits [start, end] into contiguous parts, reference
// semantics (opentick.go:63-127): truncated per-part width, last part
// absorbs the remainder; empty when numParts <= 1. int and float
// endpoints are supported.
func SplitRange(start, end interface{}, numParts int) RangeArray {
	if numParts <= 1 {
		return nil
	}
	var parts RangeArray
	switch s := start.(type) {
	case int:
		e := end.(int)
		d := (e - s) / numParts
		for i := 0; i < numParts; i++ {
			parts = append(parts, [2]interface{}{s + i*d, s + (i+1)*d})
		}
	case int64:
		e := end.(int64)
		d := (e - s) / int64(numParts)
		for i := int64(0); i < int64(numParts); i++ {
			parts = append(parts, [2]interface{}{s + i*d, s + (i+1)*d})
		}
	case float64:
		e := end.(float64)
		d := (e - s) / float64(numParts)
		for i := 0; i < numParts; i++ {
			parts = append(parts, [2]interface{}{s + float64(i)*d, s + float64(i+1)*d})
		}
	default:
		return nil
	}
	parts[len(parts)-1][1] = end
	return parts
}

// Connect dials the server in the reference's default BSON mode;
// dbName, when non-empty, is `use`d before returning (reference
// opentick.go:28-59 shape).
func Connect(host string, port int, dbName string) (Connection, error) {
	return ConnectProto(host, port, dbName, "bson")
}

// ConnectProto dials with an explicit wire codec: "bson" (the server
// default — no preamble) or "json" (negotiated with a `protocol=json`
// first frame).
func ConnectProto(host string, port int, dbName, protocol string) (Connection, error) {
	if protocol != "bson" && protocol != "json" {
		return nil, fmt.Errorf("unknown protocol %q (want bson or json)", protocol)
	}
	c := &connection{
		pending:  map[int]*future{},
		chunks:   map[int][]interface{}{},
		prepared: map[string]int{},
		timeout:  30.0,
		protocol: protocol,
	}
	sock, err := net.Dial("tcp", net.JoinHostPort(host, strconv.Itoa(port)))
	if err != nil {
		return nil, err
	}
	if t, ok := sock.(*net.TCPConn); ok {
		_ = t.SetNoDelay(true)
	}
	c.sock = sock
	if protocol == "json" {
		if err := c.writeFrame([]byte("protocol=json")); err != nil {
			sock.Close()
			return nil, err
		}
	}
	go c.readLoop()
	if dbName != "" {
		if err := c.Use(dbName); err != nil {
			c.Close()
			return nil, err
		}
	}
	return c, nil
}

type future struct {
	done chan struct{}
	val  interface{} // raw []interface{} rows, string (server error), error, or meta value
}

func newFuture() *future { return &future{done: make(chan struct{})} }

func (f *future) complete(v interface{}) {
	f.val = v
	close(f.done)
}

// Get waits for the result; optional timeout in (possibly fractional)
// seconds, defaulting to the connection timeout the future was minted
// with (reference future.Get shape). Rows decode here: json.Number →
// int64 when integral else float64, [sec, nsec] pairs → time.Time.
func (f *future) Get(timeout ...float64) ([][]interface{}, error) {
	t := 30.0
	if len(timeout) > 0 {
		t = timeout[0]
	}
	select {
	case <-f.done:
	case <-time.After(time.Duration(t * float64(time.Second))):
		return nil, errors.New("Timeout")
	}
	switch v := f.val.(type) {
	case nil:
		return nil, nil
	case string:
		return nil, errors.New(v)
	case error:
		return nil, v
	case []interface{}:
		return decodeRows(v), nil
	default:
		return nil, fmt.Errorf("unexpected result %T", v)
	}
}

type connection struct {
	sock     net.Conn
	wlock    sync.Mutex
	plock    sync.Mutex
	pending  map[int]*future
	chunks   map[int][]interface{}
	prepared map[string]int
	ticket   int
	timeout  float64
	closed   bool
	protocol string // "bson" (server default) or "json"
}

// encode/decode dispatch on the negotiated codec; both produce the
// same value model (int64/float64/string/bool/nil/array/map), so
// everything above this line is protocol-agnostic.
func (c *connection) encode(doc map[string]interface{}) ([]byte, error) {
	if c.protocol == "bson" {
		return bsonEncode(doc)
	}
	return json.Marshal(doc)
}

func (c *connection) decode(body []byte) (map[string]interface{}, error) {
	if c.protocol == "bson" {
		return bsonDecode(body)
	}
	var doc map[string]interface{}
	dec := json.NewDecoder(bytes.NewReader(body))
	dec.UseNumber() // int64 tickets/cells must not round through float64
	if err := dec.Decode(&doc); err != nil {
		return nil, err
	}
	return doc, nil
}

// ── public API ──

func (c *connection) Use(dbName string) error {
	_, err := c.callSync("use", dbName)
	return err
}

func (c *connection) Login(username, password string) error {
	_, err := c.callSync("login", username+" "+password)
	return err
}

func (c *connection) Execute(sql string, args ...interface{}) ([][]interface{}, error) {
	f, err := c.ExecuteAsync(sql, args...)
	if err != nil {
		return nil, err
	}
	return f.Get(c.timeout)
}

func (c *connection) ExecuteAsync(sql string, args ...interface{}) (Future, error) {
	return c.call("run", sql, toWireArgs(args), false, 0)
}

// ExecuteChunked streams a large SELECT as chunkRows-sized same-ticket
// frames ({"2": 1} = more follows); the future completes on the final
// frame with the reassembled rows.
func (c *connection) ExecuteChunked(sql string, args []interface{}, chunkRows int) ([][]interface{}, error) {
	if chunkRows <= 0 {
		return nil, errors.New("chunkRows must be positive")
	}
	f, err := c.call("run", sql, toWireArgs(args), false, chunkRows)
	if err != nil {
		return nil, err
	}
	return f.Get(c.timeout)
}

// ExecuteRanges scatter-gathers one pipelined query per (lo, hi) part,
// measuring each shared inclusive junction boundary with a point query
// and dropping that head run of the next part — exact concatenation
// for any projection (the Python/Scala execute_ranges semantics).
func (c *connection) ExecuteRanges(sql string, parts RangeArray) ([][]interface{}, error) {
	if len(parts) == 0 {
		return nil, nil
	}
	futs := make([]Future, len(parts))
	for i, p := range parts {
		f, err := c.ExecuteAsync(sql, p[0], p[1])
		if err != nil {
			return nil, err
		}
		futs[i] = f
	}
	overlaps := make([]Future, len(parts))
	for i := 1; i < len(parts); i++ {
		if parts[i-1][1] == parts[i][0] {
			f, err := c.ExecuteAsync(sql, parts[i][0], parts[i][0])
			if err != nil {
				return nil, err
			}
			overlaps[i] = f
		}
	}
	merged, err := futs[0].Get(c.timeout)
	if err != nil {
		return nil, err
	}
	for i := 1; i < len(parts); i++ {
		rows, err := futs[i].Get(c.timeout)
		if err != nil {
			return nil, err
		}
		k := 0
		if overlaps[i] != nil {
			dup, err := overlaps[i].Get(c.timeout)
			if err != nil {
				return nil, err
			}
			k = len(dup)
		}
		if k < len(rows) {
			merged = append(merged, rows[k:]...)
		}
	}
	return merged, nil
}

func (c *connection) Prepare(sql string) (int, error) {
	c.plock.Lock()
	if id, ok := c.prepared[sql]; ok {
		c.plock.Unlock()
		return id, nil
	}
	c.plock.Unlock()
	v, err := c.callSync("prepare", sql)
	if err != nil {
		return 0, err
	}
	id, err := asInt(v)
	if err != nil {
		return 0, fmt.Errorf("prepare returned %v", v)
	}
	c.plock.Lock()
	c.prepared[sql] = id
	c.plock.Unlock()
	return id, nil
}

func (c *connection) BatchInsert(sql string, argsArray [][]interface{}) error {
	f, err := c.BatchInsertAsync(sql, argsArray)
	if err != nil {
		return err
	}
	_, err = f.Get(c.timeout)
	return err
}

func (c *connection) BatchInsertAsync(sql string, argsArray [][]interface{}) (Future, error) {
	pid, err := c.Prepare(sql)
	if err != nil {
		return nil, err
	}
	rows := make([]interface{}, len(argsArray))
	for i, r := range argsArray {
		rows[i] = toWireArgs(r)
	}
	return c.call("batch", pid, rows, false, 0)
}

func (c *connection) ListDatabases() ([]string, error) {
	return c.metaStrings("list_databases")
}

func (c *connection) ListTables() ([]string, error) {
	return c.metaStrings("list_tables")
}

// Schema returns the table's schema: key columns then value columns
// as (name, typeName) pairs (the server's two-list wire shape).
func (c *connection) Schema(tableName string) (TableSchema, error) {
	var ts TableSchema
	v, err := c.callSync("meta", "schema "+tableName)
	if err != nil {
		return ts, err
	}
	lists, ok := v.([]interface{})
	if !ok || len(lists) != 2 {
		return ts, fmt.Errorf("schema returned %T", v)
	}
	parse := func(x interface{}) ([][2]string, error) {
		cols, ok := x.([]interface{})
		if !ok {
			return nil, fmt.Errorf("schema column list is %T", x)
		}
		out := make([][2]string, 0, len(cols))
		for _, cv := range cols {
			pair, ok := cv.([]interface{})
			if !ok || len(pair) != 2 {
				return nil, fmt.Errorf("schema column entry %v", cv)
			}
			name, ok1 := pair[0].(string)
			tpe, ok2 := pair[1].(string)
			if !ok1 || !ok2 {
				return nil, fmt.Errorf("schema column entry %v", cv)
			}
			out = append(out, [2]string{name, tpe})
		}
		return out, nil
	}
	if ts.Keys, err = parse(lists[0]); err != nil {
		return ts, err
	}
	if ts.Values, err = parse(lists[1]); err != nil {
		return ts, err
	}
	return ts, nil
}

func (c *connection) Close() {
	c.plock.Lock()
	c.closed = true
	c.plock.Unlock()
	c.sock.Close()
}

// ── wire internals ──

func (c *connection) metaStrings(cmd string) ([]string, error) {
	v, err := c.callSync("meta", cmd)
	if err != nil {
		return nil, err
	}
	arr, ok := v.([]interface{})
	if !ok {
		return nil, fmt.Errorf("meta %s returned %T", cmd, v)
	}
	out := make([]string, 0, len(arr))
	for _, x := range arr {
		s, ok := x.(string)
		if !ok {
			return nil, fmt.Errorf("meta %s element %T", cmd, x)
		}
		out = append(out, s)
	}
	return out, nil
}

// callSync issues a request and returns the RAW decoded "1" value
// (prepare ids, meta documents — results that are not row arrays).
func (c *connection) callSync(cmd string, arg interface{}) (interface{}, error) {
	f, err := c.call(cmd, arg, nil, false, 0)
	if err != nil {
		return nil, err
	}
	ff := f.(*future)
	select {
	case <-ff.done:
	case <-time.After(time.Duration(c.timeout * float64(time.Second))):
		return nil, errors.New("Timeout")
	}
	switch v := ff.val.(type) {
	case string:
		return nil, errors.New(v)
	case error:
		return nil, v
	default:
		return v, nil
	}
}

func (c *connection) call(cmd string, sqlOrID interface{}, args interface{},
	cache bool, chunkRows int) (Future, error) {
	c.plock.Lock()
	if c.closed {
		c.plock.Unlock()
		return nil, errors.New("Connection closed")
	}
	c.ticket++
	ticket := c.ticket
	f := newFuture()
	c.pending[ticket] = f
	c.plock.Unlock()
	doc := map[string]interface{}{"0": ticket, "1": cmd, "2": sqlOrID}
	if args != nil {
		doc["3"] = args
	}
	if cache {
		doc["4"] = 1
	}
	if chunkRows > 0 {
		doc["5"] = chunkRows
	}
	body, err := c.encode(doc)
	if err == nil {
		err = c.writeFrame(body)
	}
	if err != nil {
		c.plock.Lock()
		delete(c.pending, ticket)
		c.plock.Unlock()
		return nil, err
	}
	return f, nil
}

func (c *connection) writeFrame(body []byte) error {
	frame := make([]byte, 4+len(body))
	binary.LittleEndian.PutUint32(frame, uint32(len(body)))
	copy(frame[4:], body)
	c.wlock.Lock()
	defer c.wlock.Unlock()
	_, err := c.sock.Write(frame)
	return err
}

func (c *connection) readLoop() {
	defer c.failAll()
	hdr := make([]byte, 4)
	for {
		if _, err := io.ReadFull(c.sock, hdr); err != nil {
			return
		}
		n := int(int32(binary.LittleEndian.Uint32(hdr)))
		body := make([]byte, n)
		if n > 0 {
			if _, err := io.ReadFull(c.sock, body); err != nil {
				return
			}
		}
		if n == 1 && body[0] == 'H' {
			if err := c.writeFrame(nil); err != nil { // heartbeat ack
				return
			}
			continue
		}
		if n == 0 {
			continue
		}
		doc, err := c.decode(body)
		if err != nil {
			return
		}
		ticket, err := asInt(doc["0"])
		if err != nil {
			continue
		}
		if more, _ := asInt(doc["2"]); more != 0 {
			// non-final chunk: buffer RAW rows, the future stays pending
			// (decoding happens once, in Get)
			if rows, ok := doc["1"].([]interface{}); ok {
				c.plock.Lock()
				c.chunks[ticket] = append(c.chunks[ticket], rows...)
				c.plock.Unlock()
			}
			continue
		}
		c.plock.Lock()
		f := c.pending[ticket]
		delete(c.pending, ticket)
		// drop the chunk buffer unconditionally: a final frame for a
		// ticket whose future is gone must not strand buffered rows
		buf := c.chunks[ticket]
		delete(c.chunks, ticket)
		c.plock.Unlock()
		if f == nil {
			continue
		}
		switch res := doc["1"].(type) {
		case string:
			f.complete(res) // server error — voids any buffered prefix
		case []interface{}:
			f.complete(append(buf, res...))
		case nil:
			if buf != nil {
				f.complete(buf)
			} else {
				f.complete(nil)
			}
		default:
			f.complete(res) // prepare id, meta document
		}
	}
}

func (c *connection) failAll() {
	c.plock.Lock()
	defer c.plock.Unlock()
	var err interface{} = errors.New("Connection lost")
	if c.closed {
		err = errors.New("Connection closed")
	}
	for t, f := range c.pending {
		delete(c.pending, t)
		f.complete(err)
	}
	// partial chunk buffers die with the connection
	c.chunks = map[int][]interface{}{}
}

// ── value conversion ──

// toWireArgs converts caller arguments for the wire: time.Time →
// [sec, nsec] (lossless — Go time is ns-precise), [2]int64 passes
// through as a pair, everything else as-is.
func toWireArgs(args []interface{}) []interface{} {
	if len(args) == 0 {
		return nil
	}
	out := make([]interface{}, len(args))
	for i, a := range args {
		switch v := a.(type) {
		case time.Time:
			sec := v.Unix()
			out[i] = []interface{}{sec, int64(v.Nanosecond())}
		case [2]int64:
			out[i] = []interface{}{v[0], v[1]}
		default:
			out[i] = a
		}
	}
	return out
}

// decodeRows maps wire rows to client values: json.Number → int64 when
// integral else float64, and [sec, nsec] integer pairs → time.Time UTC.
func decodeRows(rows []interface{}) [][]interface{} {
	out := make([][]interface{}, 0, len(rows))
	for _, r := range rows {
		cells, ok := r.([]interface{})
		if !ok {
			continue
		}
		row := make([]interface{}, len(cells))
		for i, cell := range cells {
			row[i] = decodeCell(cell)
		}
		out = append(out, row)
	}
	return out
}

func decodeCell(cell interface{}) interface{} {
	switch v := cell.(type) {
	case json.Number:
		return decodeNumber(v)
	case []interface{}:
		// timestamp cells are [sec, nsec] int pairs; decoding is
		// strictly two-level, like the reference client
		if len(v) == 2 {
			if sec, ok1 := intNumber(v[0]); ok1 {
				if nsec, ok2 := intNumber(v[1]); ok2 {
					return time.Unix(sec, nsec).UTC()
				}
			}
		}
		out := make([]interface{}, len(v))
		for i, x := range v {
			if n, ok := x.(json.Number); ok {
				out[i] = decodeNumber(n)
			} else {
				out[i] = x
			}
		}
		return out
	default:
		return cell
	}
}

func decodeNumber(n json.Number) interface{} {
	if i, err := n.Int64(); err == nil {
		return i
	}
	f, _ := n.Float64()
	return f
}

func intNumber(v interface{}) (int64, bool) {
	switch n := v.(type) {
	case json.Number:
		i, err := n.Int64()
		return i, err == nil
	case int64: // BSON path: integers arrive pre-decoded
		return n, true
	case int:
		return int64(n), true
	default:
		return 0, false
	}
}

func asInt(v interface{}) (int, error) {
	switch n := v.(type) {
	case json.Number:
		i, err := n.Int64()
		return int(i), err
	case int64:
		return int(n), nil
	case float64:
		return int(n), nil
	case int:
		return n, nil
	default:
		return 0, fmt.Errorf("not a number: %T", v)
	}
}
