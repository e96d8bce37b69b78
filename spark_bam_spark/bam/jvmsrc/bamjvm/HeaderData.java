package bamjvm;

import java.io.IOException;
import java.io.Serializable;
import java.nio.charset.StandardCharsets;

/**
 * Parsed BAM header: contig dictionary plus the virtual position of the
 * first byte after the header (the first record's position in a freshly
 * written file).  Spec §4.2; same contract as the engine's Python
 * header parser (spark_bam_spark/bam/header.py) and the reference's
 * check/.../header/Header.scala:13-60 (behavior, not code).
 *
 * Serializable: planned once on the driver, shipped inside each input
 * partition so executors never re-read the header block chain.
 */
final class HeaderData implements Serializable {
    private static final long serialVersionUID = 1L;

    final String[] names;
    final long[] lengths;
    final long endBlockPos; // compressed offset of the block holding header end
    final int endOffset; // uncompressed offset of header end within that block

    HeaderData(String[] names, long[] lengths, long endBlockPos, int endOffset) {
        this.names = names;
        this.lengths = lengths;
        this.endBlockPos = endBlockPos;
        this.endOffset = endOffset;
    }

    int nRefs() {
        return lengths.length;
    }

    /** Parse from a window opened at compressed offset 0. */
    static HeaderData parse(BamWindow win) throws IOException {
        win.ensure(8);
        byte[] b = win.buf;
        if (win.len < 8 || b[0] != 'B' || b[1] != 'A' || b[2] != 'M' || b[3] != 1) {
            throw new IOException("not a BAM file (bad magic)");
        }
        int lText = Bgzf.i32(b, 4);
        win.ensure(8L + lText + 4);
        b = win.buf;
        int p = 8 + lText;
        int nRef = Bgzf.i32(b, p);
        p += 4;
        String[] names = new String[nRef];
        long[] lengths = new long[nRef];
        for (int i = 0; i < nRef; i++) {
            win.ensure(p + 4L);
            b = win.buf;
            int lName = Bgzf.i32(b, p);
            win.ensure(p + 4L + lName + 4);
            b = win.buf;
            names[i] = new String(b, p + 4, lName - 1, StandardCharsets.US_ASCII);
            lengths[i] = Bgzf.i32(b, p + 4 + lName);
            p += 8 + lName;
        }
        // map the header-end uncompressed offset to a virtual position
        int bi = win.blockIndexOf(p);
        return new HeaderData(names, lengths, win.blockStarts[bi], p - win.blockUstarts[bi]);
    }
}
