// Cross-codec golden-frame conformance for the stdlib BSON codec: the
// committed bson_golden.jsonl holds the exact bytes the server codec
// (engine/Bson.scala) emits for a shared fixture set, and BsonSpec pins
// the Scala side to them on every sbt run. This test pins the Go side
// to the SAME bytes whenever a Go toolchain exists: every frame must
// decode to the expected document and re-encode byte-identically,
// except the width-folding fixtures (int32 decodes to int64, so the
// re-encoded frame legitimately widens) — those are held to a
// decode → encode → decode fixpoint instead. Key order is no longer a
// reason to exclude anything: bsonEncode emits canonical sorted keys.
package graftclient

import (
	"bufio"
	"bytes"
	"encoding/hex"
	"encoding/json"
	"math"
	"os"
	"reflect"
	"testing"
)

// expected decoded value per fixture, in the Go codec's value model
// (int32/int64 → int64, double → float64, arrays → []interface{}).
var bsonGoldenWant = map[string]map[string]interface{}{
	"spec_hello":   {"hello": "world"},
	"utf8_string":  {"s": "naïve ✓"},
	"i32_min":      {"i": int64(math.MinInt32)},
	"i32_plain":    {"k": int64(1986)},
	"i64_max":      {"l": int64(math.MaxInt64)},
	"i64_neg":      {"l": int64(-5000000000)},
	"dbl_neg_half": {"d": -0.5},
	"dbl_pi":       {"d": 3.141592653589793},
	"bool_true":    {"b": true},
	"bool_false":   {"b": false},
	"null_elem":    {"n": nil},
	"arr_mixed": {"a": []interface{}{int64(1), 2.5, "x", true, nil,
		int64(math.MaxInt64)}},
	"ts_pair": {"t": []interface{}{int64(7), int64(123)}},
	"subdoc": {"m": map[string]interface{}{
		"k": []interface{}{int64(1), int64(2)}}},
	"empty_doc": {},
	"wire_insert": {"0": int64(5), "1": "run",
		"2": "insert into t values(?, ?)",
		"3": []interface{}{int64(42), "x"}},
}

// The codec decodes int32 frames to int64, so a byte-exact re-encode
// needs the original width back. The fixtures below carry no int32
// elements and re-encode byte-exactly (keys are canonical-sorted on
// encode, and every multi-key fixture's authored order is sorted);
// the width-folding cases (i32_min, i32_plain, arr_mixed, subdoc,
// wire_insert) are covered by the decode assertions plus the fixpoint
// check.
var bsonGoldenReencode = []string{"spec_hello", "utf8_string", "i64_max",
	"i64_neg", "dbl_neg_half", "dbl_pi", "bool_true", "bool_false",
	"null_elem", "ts_pair", "empty_doc"}

func TestBsonGoldenFrames(t *testing.T) {
	f, err := os.Open("bson_golden.jsonl")
	if err != nil {
		t.Fatalf("missing golden file: %v", err)
	}
	defer f.Close()
	type row struct{ Name, Hex string }
	got := map[string]string{}
	sc := bufio.NewScanner(f)
	for sc.Scan() {
		line := bytes.TrimSpace(sc.Bytes())
		if len(line) == 0 {
			continue
		}
		var r row
		if err := json.Unmarshal(line, &r); err != nil {
			t.Fatalf("bad golden line %q: %v", line, err)
		}
		got[r.Name] = r.Hex
	}
	if len(got) != len(bsonGoldenWant) {
		t.Fatalf("fixture set drifted: file has %d, test expects %d",
			len(got), len(bsonGoldenWant))
	}
	reenc := map[string]bool{}
	for _, n := range bsonGoldenReencode {
		reenc[n] = true
	}
	for name, hx := range got {
		want, ok := bsonGoldenWant[name]
		if !ok {
			t.Errorf("%s: unknown fixture in golden file", name)
			continue
		}
		frame, err := hex.DecodeString(hx)
		if err != nil {
			t.Fatalf("%s: bad hex: %v", name, err)
		}
		dec, err := bsonDecode(frame)
		if err != nil {
			t.Errorf("%s: decode failed: %v", name, err)
			continue
		}
		if !reflect.DeepEqual(dec, want) {
			t.Errorf("%s: decoded %#v, want %#v", name, dec, want)
		}
		if reenc[name] {
			// ints decode to int64 and re-encode as int64 frames —
			// these fixtures were authored i64/double/string-side so
			// the bytes round-trip exactly
			enc, err := bsonEncode(dec)
			if err != nil {
				t.Errorf("%s: re-encode failed: %v", name, err)
			} else if !bytes.Equal(enc, frame) {
				t.Errorf("%s: re-encode drifted: %x != %s", name, enc, hx)
			}
		} else {
			// width-folding / multi-key fixtures: the decode → encode →
			// decode fixpoint must hold even when byte order/width can't
			enc, err := bsonEncode(dec)
			if err != nil {
				t.Errorf("%s: re-encode failed: %v", name, err)
				continue
			}
			dec2, err := bsonDecode(enc)
			if err != nil {
				t.Errorf("%s: fixpoint decode failed: %v", name, err)
			} else if !reflect.DeepEqual(dec2, dec) {
				t.Errorf("%s: fixpoint drifted: %#v != %#v", name, dec2, dec)
			}
		}
	}
}
