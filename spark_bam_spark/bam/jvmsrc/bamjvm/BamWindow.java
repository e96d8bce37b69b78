package bamjvm;

import java.io.IOException;
import java.util.zip.Inflater;
import org.apache.hadoop.fs.FSDataInputStream;

/**
 * Lazily-extended uncompressed window over the BGZF block stream
 * starting at the first block at/after a byte offset — the JVM twin of
 * the engine's Python {@code _Window} (spark_bam_spark/bam/datasource.py)
 * and, behaviorally, the reference's SeekableUncompressedBytes
 * (bgzf/.../block/UncompressedBytes.scala:13-81; cited, not copied).
 *
 * All reads are positioned reads on the Hadoop stream, so the window is
 * safe to use against any Hadoop-compatible filesystem.
 */
final class BamWindow {
    final FSDataInputStream in;
    byte[] buf = new byte[1 << 20];
    int len = 0;
    long[] blockStarts = new long[64];
    int[] blockUstarts = new int[64];
    int nBlocks = 0;
    boolean empty = false;

    private long nextCpos;
    private boolean exhausted = false;
    private final Inflater inflater = new Inflater(true);
    private final byte[] cbuf = new byte[Bgzf.MAX_BLOCK_SIZE];

    /**
     * Open at the first BGZF block at/after {@code start} ({@code start
     * == 0} trusts the offset; otherwise a bounded forward scan finds the
     * next block boundary, and no boundary within 64 KiB means the range
     * is empty).
     */
    BamWindow(FSDataInputStream in, long start) throws IOException {
        this.in = in;
        if (start == 0) {
            nextCpos = 0;
        } else {
            byte[] probe = new byte[Bgzf.MAX_BLOCK_SIZE * 2];
            int got = readAt(start, probe, probe.length);
            int rel = got <= 0 ? -1 : Bgzf.findBlockStart(probe, got, 0);
            if (rel < 0) {
                empty = true;
                return;
            }
            nextCpos = start + rel;
        }
        loadBlock();
        if (nBlocks == 0) {
            empty = true;
        }
    }

    private int readAt(long pos, byte[] dst, int want) throws IOException {
        int total = 0;
        while (total < want) {
            int got = in.read(pos + total, dst, total, want - total);
            if (got <= 0) {
                break;
            }
            total += got;
        }
        return total;
    }

    /** Decompress the next block onto the window; false at stream end. */
    boolean loadBlock() throws IOException {
        if (exhausted) {
            return false;
        }
        int got = readAt(nextCpos, cbuf, Bgzf.MAX_BLOCK_SIZE);
        if (got < Bgzf.HEADER_LEN) {
            exhausted = true;
            return false;
        }
        int bsize = Bgzf.parseBlockHeader(cbuf, 0, got);
        if (bsize < 0 || got < bsize) {
            exhausted = true;
            return false;
        }
        long isize = Bgzf.i32(cbuf, bsize - 4) & 0xFFFFFFFFL;
        if (isize == 0) {
            exhausted = true; // standard BGZF EOF block
            return false;
        }
        grow(len + (int) isize);
        int produced = Bgzf.inflateBlock(inflater, cbuf, bsize, buf, len);
        if (nBlocks == blockStarts.length) {
            long[] ns = new long[nBlocks * 2];
            int[] nu = new int[nBlocks * 2];
            System.arraycopy(blockStarts, 0, ns, 0, nBlocks);
            System.arraycopy(blockUstarts, 0, nu, 0, nBlocks);
            blockStarts = ns;
            blockUstarts = nu;
        }
        blockStarts[nBlocks] = nextCpos;
        blockUstarts[nBlocks] = len;
        nBlocks++;
        len += produced;
        nextCpos += bsize;
        return true;
    }

    private void grow(int need) {
        if (need <= buf.length) {
            return;
        }
        int cap = buf.length;
        while (cap < need) {
            cap <<= 1;
        }
        byte[] nb = new byte[cap];
        System.arraycopy(buf, 0, nb, 0, len);
        buf = nb;
    }

    /** Extend the window until it holds at least {@code nbytes}. */
    void ensure(long nbytes) throws IOException {
        while (len < nbytes && loadBlock()) {
            // keep loading
        }
    }

    /**
     * Drop every whole block before the one owning {@code keepFrom} and
     * slide the retained bytes to the front; returns the number of bytes
     * cut (callers rebase their offsets by it).  Keeps the sequential
     * record walk at O(current block + lookahead) memory instead of
     * O(split) — the property that lets 32 concurrent 64 MiB-split tasks
     * fit in a default executor heap.
     */
    int compactBefore(int keepFrom) {
        int j = blockIndexOf(keepFrom);
        if (j == 0) {
            return 0;
        }
        int cut = blockUstarts[j];
        System.arraycopy(buf, cut, buf, 0, len - cut);
        len -= cut;
        for (int i = j; i < nBlocks; i++) {
            blockStarts[i - j] = blockStarts[i];
            blockUstarts[i - j] = blockUstarts[i] - cut;
        }
        nBlocks -= j;
        return cut;
    }

    /** Index of the block owning uncompressed offset {@code u}. */
    int blockIndexOf(int u) {
        int lo = 0;
        int hi = nBlocks - 1;
        while (lo < hi) {
            int mid = (lo + hi + 1) >>> 1;
            if (blockUstarts[mid] <= u) {
                lo = mid;
            } else {
                hi = mid - 1;
            }
        }
        return lo;
    }

    /**
     * Release the inflater's native zlib buffers eagerly.  RecordWalker
     * builds a fresh window per byte range (an indexed scan walks many
     * ranges per split), so waiting for GC to run the inflater's cleaner
     * would accumulate native memory proportional to ranges walked.
     * Idempotent; the window must not be used afterwards.
     */
    void release() {
        exhausted = true;
        inflater.end();
    }

    /**
     * Uncompressed window offset of a virtual position; loads blocks
     * until the target block is present.
     */
    int offsetOf(long blockPos, int inBlock) throws IOException {
        ensure(1);
        while (nBlocks > 0 && blockStarts[nBlocks - 1] < blockPos && loadBlock()) {
            // keep loading
        }
        for (int i = 0; i < nBlocks; i++) {
            if (blockStarts[i] == blockPos) {
                return blockUstarts[i] + inBlock;
            }
        }
        throw new IllegalStateException("block " + blockPos + " not in window");
    }
}
