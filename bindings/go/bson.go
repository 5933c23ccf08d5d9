// BSON codec for the graft wire protocol, hand-implemented from the
// public BSON spec (bsonspec.org) with only Go's standard library —
// the reference SDK pulls gopkg.in/mgo.v2/bson for this; here the
// subset the wire documents actually use is ~200 lines, so the client
// stays dependency-free in BOTH protocols.
//
// Element types mirror the server codec (engine/Bson.scala): double
// (0x01), string (0x02), embedded document (0x03), array (0x04),
// boolean (0x08), UTC datetime (0x09, decode only — tolerated from
// foreign encoders), null (0x0A), int32 (0x10), int64 (0x12).
// Int32 and int64 both decode to Go int64 and double to float64, the
// same value model the JSON path produces after json.Number folding,
// so everything above the codec is protocol-agnostic.
package graftclient

import (
	"encoding/binary"
	"errors"
	"fmt"
	"math"
	"sort"
	"time"
)

// bsonEncode serializes a wire document. Supported values: nil, bool,
// int, int32, int64, float64, string, []interface{},
// map[string]interface{}; time.Time and [2]int64 are expected to have
// been folded to [sec, nsec] pairs by toWireArgs already, but are
// accepted here too for robustness.
//
// Keys are emitted in SORTED order — canonical encoding. Go map
// iteration is randomized, which would make every request frame
// byte-nondeterministic; the server decodes documents order-agnostically
// (engine/Server.scala keys by name), and every wire document this
// client produces uses the numeric-string keys "0".."5", whose sorted
// order equals the Scala client's insertion order — so canonical frames
// here are byte-identical to NetClient.scala's, which is what lets
// bindings/go/session_golden.jsonl pin the whole client↔server framing
// on both sides (the session-transcript analog of bson_golden.jsonl).
func bsonEncode(doc map[string]interface{}) ([]byte, error) {
	return bsonDoc(func(emit func(string, interface{}) error) error {
		keys := make([]string, 0, len(doc))
		for k := range doc {
			keys = append(keys, k)
		}
		sort.Strings(keys)
		for _, k := range keys {
			if err := emit(k, doc[k]); err != nil {
				return err
			}
		}
		return nil
	})
}

func bsonDoc(each func(emit func(string, interface{}) error) error) ([]byte, error) {
	var body []byte
	err := each(func(name string, v interface{}) error {
		elem, err := bsonElem(name, v)
		if err != nil {
			return err
		}
		body = append(body, elem...)
		return nil
	})
	if err != nil {
		return nil, err
	}
	out := make([]byte, 4, 4+len(body)+1)
	binary.LittleEndian.PutUint32(out, uint32(4+len(body)+1))
	out = append(out, body...)
	out = append(out, 0x00)
	return out, nil
}

func bsonElem(name string, v interface{}) ([]byte, error) {
	key := append([]byte(name), 0x00)
	switch x := v.(type) {
	case nil:
		return append([]byte{0x0A}, key...), nil
	case bool:
		b := byte(0)
		if x {
			b = 1
		}
		return append(append([]byte{0x08}, key...), b), nil
	case int:
		if x >= math.MinInt32 && x <= math.MaxInt32 {
			out := append([]byte{0x10}, key...)
			return binary.LittleEndian.AppendUint32(out, uint32(int32(x))), nil
		}
		out := append([]byte{0x12}, key...)
		return binary.LittleEndian.AppendUint64(out, uint64(int64(x))), nil
	case int32:
		out := append([]byte{0x10}, key...)
		return binary.LittleEndian.AppendUint32(out, uint32(x)), nil
	case int64:
		out := append([]byte{0x12}, key...)
		return binary.LittleEndian.AppendUint64(out, uint64(x)), nil
	case float64:
		out := append([]byte{0x01}, key...)
		return binary.LittleEndian.AppendUint64(out, math.Float64bits(x)), nil
	case string:
		out := append([]byte{0x02}, key...)
		out = binary.LittleEndian.AppendUint32(out, uint32(len(x)+1))
		out = append(out, x...)
		return append(out, 0x00), nil
	case time.Time:
		return bsonElem(name, []interface{}{x.Unix(), int64(x.Nanosecond())})
	case [2]int64:
		return bsonElem(name, []interface{}{x[0], x[1]})
	case []interface{}:
		doc, err := bsonDoc(func(emit func(string, interface{}) error) error {
			for i, e := range x {
				if err := emit(fmt.Sprintf("%d", i), e); err != nil {
					return err
				}
			}
			return nil
		})
		if err != nil {
			return nil, err
		}
		return append(append([]byte{0x04}, key...), doc...), nil
	case [][]interface{}:
		rows := make([]interface{}, len(x))
		for i, r := range x {
			rows[i] = r
		}
		return bsonElem(name, rows)
	case map[string]interface{}:
		// canonical sorted keys, same rule (and reason) as bsonEncode
		doc, err := bsonDoc(func(emit func(string, interface{}) error) error {
			keys := make([]string, 0, len(x))
			for k := range x {
				keys = append(keys, k)
			}
			sort.Strings(keys)
			for _, k := range keys {
				if err := emit(k, x[k]); err != nil {
					return err
				}
			}
			return nil
		})
		if err != nil {
			return nil, err
		}
		return append(append([]byte{0x03}, key...), doc...), nil
	default:
		return nil, fmt.Errorf("bson: unsupported value %T", v)
	}
}

// bsonDecode parses a wire document into the client value model
// (int64 / float64 / string / bool / nil / []interface{} /
// map[string]interface{}).
func bsonDecode(data []byte) (map[string]interface{}, error) {
	doc, end, err := bsonReadDoc(data, 0)
	if err != nil {
		return nil, err
	}
	if end != len(data) {
		return nil, errors.New("bson: trailing bytes after document")
	}
	return doc, nil
}

func bsonReadDoc(data []byte, pos int) (map[string]interface{}, int, error) {
	if pos+4 > len(data) {
		return nil, 0, errors.New("bson: truncated document length")
	}
	total := int(int32(binary.LittleEndian.Uint32(data[pos:])))
	end := pos + total
	if total < 5 || end > len(data) {
		return nil, 0, errors.New("bson: bad document length")
	}
	pos += 4
	doc := map[string]interface{}{}
	for pos < end-1 {
		tpe := data[pos]
		pos++
		name, p, err := bsonReadCString(data, pos)
		if err != nil {
			return nil, 0, err
		}
		pos = p
		val, p2, err := bsonReadValue(data, pos, tpe)
		if err != nil {
			return nil, 0, err
		}
		pos = p2
		doc[name] = val
	}
	if pos != end-1 || data[pos] != 0x00 {
		return nil, 0, errors.New("bson: missing document terminator")
	}
	return doc, end, nil
}

func bsonReadCString(data []byte, pos int) (string, int, error) {
	for i := pos; i < len(data); i++ {
		if data[i] == 0x00 {
			return string(data[pos:i]), i + 1, nil
		}
	}
	return "", 0, errors.New("bson: unterminated cstring")
}

func bsonReadValue(data []byte, pos int, tpe byte) (interface{}, int, error) {
	switch tpe {
	case 0x01: // double
		if pos+8 > len(data) {
			return nil, 0, errors.New("bson: truncated double")
		}
		return math.Float64frombits(binary.LittleEndian.Uint64(data[pos:])),
			pos + 8, nil
	case 0x02: // string
		if pos+4 > len(data) {
			return nil, 0, errors.New("bson: truncated string length")
		}
		n := int(int32(binary.LittleEndian.Uint32(data[pos:])))
		pos += 4
		if n < 1 || pos+n > len(data) || data[pos+n-1] != 0x00 {
			return nil, 0, errors.New("bson: bad string")
		}
		return string(data[pos : pos+n-1]), pos + n, nil
	case 0x03: // embedded document
		return bsonReadDocAt(data, pos, func(d map[string]interface{}) interface{} {
			return d
		})
	case 0x04: // array: document keyed "0","1",… in order
		doc, end, err := bsonReadDoc(data, pos)
		if err != nil {
			return nil, 0, err
		}
		arr := make([]interface{}, len(doc))
		for i := range arr {
			v, ok := doc[fmt.Sprintf("%d", i)]
			if !ok {
				return nil, 0, errors.New("bson: sparse array document")
			}
			arr[i] = v
		}
		return arr, end, nil
	case 0x05: // binary (tolerated): int32 len + subtype + bytes
		if pos+5 > len(data) {
			return nil, 0, errors.New("bson: truncated binary")
		}
		n := int(int32(binary.LittleEndian.Uint32(data[pos:])))
		pos += 5
		if n < 0 || pos+n > len(data) {
			return nil, 0, errors.New("bson: bad binary length")
		}
		out := make([]byte, n)
		copy(out, data[pos:pos+n])
		return out, pos + n, nil
	case 0x08: // boolean
		if pos+1 > len(data) {
			return nil, 0, errors.New("bson: truncated boolean")
		}
		return data[pos] != 0, pos + 1, nil
	case 0x09: // UTC datetime, ms since epoch (foreign encoders only)
		if pos+8 > len(data) {
			return nil, 0, errors.New("bson: truncated datetime")
		}
		ms := int64(binary.LittleEndian.Uint64(data[pos:]))
		return time.UnixMilli(ms).UTC(), pos + 8, nil
	case 0x0A: // null
		return nil, pos, nil
	case 0x10: // int32 → int64, the uniform client integer type
		if pos+4 > len(data) {
			return nil, 0, errors.New("bson: truncated int32")
		}
		return int64(int32(binary.LittleEndian.Uint32(data[pos:]))), pos + 4, nil
	case 0x11, 0x12: // mongo timestamp (opaque) / int64
		if pos+8 > len(data) {
			return nil, 0, errors.New("bson: truncated int64")
		}
		return int64(binary.LittleEndian.Uint64(data[pos:])), pos + 8, nil
	default:
		return nil, 0, fmt.Errorf("bson: unsupported element type 0x%02x", tpe)
	}
}

func bsonReadDocAt(data []byte, pos int,
	wrap func(map[string]interface{}) interface{}) (interface{}, int, error) {
	doc, end, err := bsonReadDoc(data, pos)
	if err != nil {
		return nil, 0, err
	}
	return wrap(doc), end, nil
}
