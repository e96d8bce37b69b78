package bamjvm;

import java.io.IOException;
import java.nio.charset.StandardCharsets;
import java.util.ArrayList;
import java.util.List;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FSDataInputStream;
import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData;
import org.apache.spark.sql.catalyst.util.GenericArrayData;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * Per-split BAM record reader: re-sync on the first owned record, then a
 * sequential record walk with per-record decode of only the requested
 * columns.  Value semantics are byte-identical to the engine's Python
 * vectorized decoder (spark_bam_spark/bam/vectordecode.py) — the
 * differential test suite compares the two row-for-row.
 *
 * Ownership rule (identical to the Python source and the reference's
 * split contract): a split owns exactly the records whose start lies in
 * a BGZF block whose compressed start is in [split.start, split.end).
 */
final class BamPartitionReader implements PartitionReader<InternalRow> {
    private static final int FIXED = 36;
    private static final byte[] CIGAR_CHARS = "MIDNSHP=X???????".getBytes(StandardCharsets.US_ASCII);
    private static final byte[] SEQ_CHARS = "=ACMGRSVTWYHKDBN".getBytes(StandardCharsets.US_ASCII);
    private static final boolean[] REF_CONSUMING = new boolean[16];
    private static final int[] TAG_SIZES = new int[256];

    static {
        REF_CONSUMING[0] = true; // M
        REF_CONSUMING[2] = true; // D
        REF_CONSUMING[3] = true; // N
        REF_CONSUMING[7] = true; // =
        REF_CONSUMING[8] = true; // X
        for (int i = 0; i < 256; i++) {
            TAG_SIZES[i] = -1;
        }
        TAG_SIZES['c'] = 1;
        TAG_SIZES['C'] = 1;
        TAG_SIZES['s'] = 2;
        TAG_SIZES['S'] = 2;
        TAG_SIZES['i'] = 4;
        TAG_SIZES['I'] = 4;
        TAG_SIZES['f'] = 4;
    }

    // field ids in full-schema order; the pruned schema maps to these
    private static final String[] ALL_FIELDS = {
        "qname", "flag", "ref_idx", "rname", "pos", "end_pos", "mapq", "cigar",
        "n_cigar_ops", "mate_ref_idx", "mate_pos", "tlen", "seq", "seq_len",
        "qual", "tags", "block_pos", "offset",
    };

    private final BamDataSource.BamSplit split;
    private final int[] fieldIds;
    private final UTF8String[] refNames;

    private FSDataInputStream in;
    private BamWindow win;
    private boolean done = false;
    private long u = -1;
    private int bi = 0;
    private InternalRow current;

    BamPartitionReader(BamDataSource.BamSplit split, String[] fieldNames) {
        this.split = split;
        this.fieldIds = new int[fieldNames.length];
        for (int i = 0; i < fieldNames.length; i++) {
            int id = -1;
            for (int j = 0; j < ALL_FIELDS.length; j++) {
                if (ALL_FIELDS[j].equals(fieldNames[i])) {
                    id = j;
                    break;
                }
            }
            if (id < 0) {
                throw new IllegalArgumentException("unknown column " + fieldNames[i]);
            }
            this.fieldIds[i] = id;
        }
        this.refNames = new UTF8String[split.header.names.length];
        for (int i = 0; i < refNames.length; i++) {
            refNames[i] = UTF8String.fromString(split.header.names[i]);
        }
    }

    private void open() throws IOException {
        Path p = new Path(split.path);
        FileSystem fs = p.getFileSystem(new Configuration());
        in = fs.open(p);
        if (split.end <= split.start) {
            done = true;
            return;
        }
        win = new BamWindow(in, split.start);
        if (win.empty) {
            done = true;
            return;
        }
        if (split.start == 0) {
            u = win.offsetOf(split.header.endBlockPos, split.header.endOffset);
        } else {
            win.ensure(4L * Bgzf.MAX_BLOCK_SIZE); // lookahead for successor checks
            u = Checker.findRecordStart(win, 0, split.header, split.readsToCheck, split.maxReadSize);
            if (u < 0) {
                done = true;
                return;
            }
        }
        bi = 0;
        while (bi + 1 < win.nBlocks && u >= win.blockUstarts[bi + 1]) {
            bi++;
        }
        if (win.blockStarts[bi] >= split.end) {
            done = true; // window's first block already belongs to the next split
        }
    }

    @Override
    public boolean next() throws IOException {
        if (u < 0 && !done) {
            try {
                open();
            } catch (IOException e) {
                if (!split.permissive) {
                    throw e;
                }
                done = true;
            }
        }
        if (done) {
            return false;
        }
        try {
            return advance();
        } catch (IOException e) {
            if (!split.permissive) {
                throw e;
            }
            done = true; // permissive: salvage the records already emitted
            return false;
        }
    }

    // slide the window once >=4 MiB of it has been consumed: the copy
    // cost is a few hundred KiB of tail per 4 MiB walked (<10% of bytes
    // touched once more), and per-task memory stays O(lookahead)
    private static final long COMPACT_AFTER = 4L << 20;

    private boolean advance() throws IOException {
        if (u > COMPACT_AFTER) {
            u -= win.compactBefore((int) u);
            bi = win.blockIndexOf((int) u);
        }
        byte[] b = win.buf;
        if (u + 4 > win.len) {
            win.ensure(u + (256L << 10));
            b = win.buf;
            if (u + 4 > win.len) {
                done = true;
                return false; // clean EOF or dangling partial length int
            }
        }
        if (bi + 1 < win.nBlocks && u >= win.blockUstarts[bi + 1]) {
            while (bi + 1 < win.nBlocks && u >= win.blockUstarts[bi + 1]) {
                bi++;
            }
            if (win.blockStarts[bi] >= split.end) {
                done = true;
                return false; // first record of the next split — not ours
            }
        }
        int o = (int) u;
        int blockSize = Bgzf.i32(b, o);
        if (blockSize < 32) {
            throw new IOException("truncated/invalid record at " + u);
        }
        long nxt = u + 4 + blockSize;
        if (nxt > win.len) {
            win.ensure(nxt + (256L << 10));
            b = win.buf;
            if (nxt > win.len) {
                throw new IOException("truncated/invalid record at " + u);
            }
        }
        current = decode(b, o, blockSize);
        u = nxt;
        return true;
    }

    @Override
    public InternalRow get() {
        return current;
    }

    @Override
    public void close() throws IOException {
        if (in != null) {
            in.close();
        }
    }

    // --------------------------------------------------------------- decode

    private InternalRow decode(byte[] b, int o, int blockSize) {
        Object[] vals = new Object[fieldIds.length];
        // layout offsets shared by several columns; computed once per record
        int lName = b[o + 12] & 0xFF;
        int nCigar = Bgzf.u16(b, o + 16);
        int lSeq = Math.max(Bgzf.i32(b, o + 20), 0);
        int nameStart = o + FIXED;
        int cigarStart = nameStart + lName;
        int seqStart = cigarStart + 4 * nCigar;
        int packedLen = (lSeq + 1) / 2;
        int qualStart = seqStart + packedLen;
        int tagStart = qualStart + lSeq;
        int recordEnd = o + 4 + blockSize;
        for (int i = 0; i < fieldIds.length; i++) {
            switch (fieldIds[i]) {
                case 0: // qname (trailing NUL stripped)
                    vals[i] = utf8(b, nameStart, Math.max(lName - 1, 0));
                    break;
                case 1: // flag
                    vals[i] = Bgzf.u16(b, o + 18);
                    break;
                case 2: // ref_idx
                    vals[i] = Bgzf.i32(b, o + 4);
                    break;
                case 3: { // rname
                    int r = Bgzf.i32(b, o + 4);
                    vals[i] = (r >= 0 && r < refNames.length) ? refNames[r] : null;
                    break;
                }
                case 4: // pos
                    vals[i] = (long) Bgzf.i32(b, o + 8);
                    break;
                case 5: { // end_pos = pos + reference-consumed cigar length
                    long pos = Bgzf.i32(b, o + 8);
                    if (pos < 0) {
                        vals[i] = -1L;
                    } else {
                        long consumed = 0;
                        for (int c = 0; c < nCigar; c++) {
                            int v = Bgzf.i32(b, cigarStart + 4 * c);
                            if (REF_CONSUMING[v & 0xF]) {
                                consumed += (v >>> 4);
                            }
                        }
                        vals[i] = pos + consumed;
                    }
                    break;
                }
                case 6: // mapq
                    vals[i] = b[o + 13] & 0xFF;
                    break;
                case 7: { // cigar ('*' when empty)
                    if (nCigar == 0) {
                        vals[i] = UTF8String.fromString("*");
                    } else {
                        StringBuilder sb = new StringBuilder(nCigar * 4);
                        for (int c = 0; c < nCigar; c++) {
                            int v = Bgzf.i32(b, cigarStart + 4 * c);
                            sb.append(v >>> 4).append((char) CIGAR_CHARS[v & 0xF]);
                        }
                        vals[i] = UTF8String.fromString(sb.toString());
                    }
                    break;
                }
                case 8: // n_cigar_ops
                    vals[i] = nCigar;
                    break;
                case 9: // mate_ref_idx
                    vals[i] = Bgzf.i32(b, o + 24);
                    break;
                case 10: // mate_pos
                    vals[i] = (long) Bgzf.i32(b, o + 28);
                    break;
                case 11: // tlen
                    vals[i] = Bgzf.i32(b, o + 32);
                    break;
                case 12: { // seq (4-bit packed, high nibble first)
                    byte[] out = new byte[lSeq];
                    for (int k = 0; k < lSeq; k++) {
                        int packed = b[seqStart + (k >> 1)] & 0xFF;
                        out[k] = SEQ_CHARS[(k & 1) == 0 ? (packed >> 4) : (packed & 0xF)];
                    }
                    vals[i] = UTF8String.fromBytes(out);
                    break;
                }
                case 13: // seq_len
                    vals[i] = lSeq;
                    break;
                case 14: { // qual (phred+33, wrapping like the Python path)
                    byte[] out = new byte[lSeq];
                    for (int k = 0; k < lSeq; k++) {
                        out[k] = (byte) ((b[qualStart + k] + 33) & 0xFF);
                    }
                    vals[i] = utf8(out, 0, lSeq);
                    break;
                }
                case 15: // tags
                    vals[i] = decodeTags(b, tagStart, recordEnd);
                    break;
                case 16: // block_pos
                    vals[i] = win.blockStarts[bi];
                    break;
                case 17: // offset
                    vals[i] = o - win.blockUstarts[bi];
                    break;
                default:
                    throw new IllegalStateException();
            }
        }
        return new GenericInternalRow(vals);
    }

    /**
     * Z-typed auxiliary fields as a string map; fixed-size typed tags are
     * skipped and the scan stops at H/B/unknown types or a corrupt Z —
     * the same contract as the Python decoder's tags() pass.
     */
    private ArrayBasedMapData decodeTags(byte[] b, int p, int end) {
        List<UTF8String> keys = null;
        List<UTF8String> valsList = null;
        while (p + 3 <= end) {
            int typ = b[p + 2] & 0xFF;
            if (typ == 'Z') {
                int z = p + 3;
                while (z < end && b[z] != 0) {
                    z++;
                }
                if (z >= end) {
                    break; // no NUL inside this record's tag region
                }
                if (keys == null) {
                    keys = new ArrayList<>(4);
                    valsList = new ArrayList<>(4);
                }
                keys.add(utf8(b, p, 2));
                valsList.add(utf8(b, p + 3, z - (p + 3)));
                p = z + 1;
            } else {
                int sz = TAG_SIZES[typ];
                if (sz < 0) {
                    break; // H/B/unknown: stop scanning this record
                }
                p += 3 + sz;
            }
        }
        if (keys == null) {
            return new ArrayBasedMapData(
                    new GenericArrayData(new Object[0]), new GenericArrayData(new Object[0]));
        }
        return new ArrayBasedMapData(
                new GenericArrayData(keys.toArray()), new GenericArrayData(valsList.toArray()));
    }

    /**
     * UTF8String from raw bytes: pure-ASCII slices wrap directly; any
     * byte >= 0x80 falls back to latin-1 codepoints, matching the Python
     * decoder's errors-tolerant behavior on corrupt inputs.
     */
    private static UTF8String utf8(byte[] b, int off, int len) {
        boolean ascii = true;
        for (int i = 0; i < len; i++) {
            if ((b[off + i] & 0x80) != 0) {
                ascii = false;
                break;
            }
        }
        if (ascii) {
            byte[] copy = new byte[len];
            System.arraycopy(b, off, copy, 0, len);
            return UTF8String.fromBytes(copy);
        }
        return UTF8String.fromString(new String(b, off, len, StandardCharsets.ISO_8859_1));
    }
}
