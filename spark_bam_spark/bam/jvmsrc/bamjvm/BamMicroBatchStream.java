package bamjvm;

import java.io.IOException;
import java.io.UncheckedIOException;
import java.util.ArrayList;
import java.util.HashSet;
import java.util.List;
import java.util.Set;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.FileSystem;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream;
import org.apache.spark.sql.connector.read.streaming.Offset;

/**
 * Structured Streaming source over a landing directory of BAM files:
 * each micro-batch ingests the .bam files that appeared since the last
 * batch, planned through the SAME per-file splitter, pushdown, and
 * reader factory as the batch scan (BamDataSource.BamScan) — so a
 * streaming ingest pipeline gets identical rows, pruning, and locality
 * hints to a batch read of the same files.
 *
 * Offsets are the name-sorted set of files seen so far, serialized as a
 * JSON array; {@code planInputPartitions(start, end)} plans exactly the
 * set difference, so restart-from-checkpoint replays deterministically.
 * Files are ingested WHOLE once they appear: the lister only matches
 * "*.bam", and this engine's own writer lands files as
 * ".part-N.bam.inprogress" renamed atomically on commit, so a torn file
 * is never visible.  (For very large landing dirs a production variant
 * would compact offsets into a metadata log the way Spark's file stream
 * source does; the set-of-names offset keeps the contract exact and the
 * implementation auditable.)
 *
 * The reference has no streaming surface; this is Spark-first added
 * value on the format layer (its batch loadReads is the analogue —
 * load/.../CanLoadBam.scala, cited as behavior).
 */
final class BamMicroBatchStream implements MicroBatchStream {
    private final BamDataSource.BamScan scan;

    BamMicroBatchStream(BamDataSource.BamScan scan) {
        this.scan = scan;
    }

    /** Name-sorted file set, JSON-serialized. */
    static final class FilesOffset extends Offset {
        final List<String> names; // sorted

        FilesOffset(List<String> names) {
            this.names = names;
        }

        @Override
        public String json() {
            StringBuilder sb = new StringBuilder("[");
            for (int i = 0; i < names.size(); i++) {
                if (i > 0) {
                    sb.append(',');
                }
                sb.append('"');
                // minimal JSON string escaping (file names)
                for (int j = 0; j < names.get(i).length(); j++) {
                    char c = names.get(i).charAt(j);
                    if (c == '"' || c == '\\') {
                        sb.append('\\');
                    }
                    sb.append(c);
                }
                sb.append('"');
            }
            return sb.append(']').toString();
        }

        static FilesOffset parse(String json) {
            List<String> out = new ArrayList<>();
            int i = 0;
            StringBuilder cur = null;
            while (i < json.length()) {
                char c = json.charAt(i++);
                if (cur == null) {
                    if (c == '"') {
                        cur = new StringBuilder();
                    }
                } else if (c == '\\' && i < json.length()) {
                    cur.append(json.charAt(i++));
                } else if (c == '"') {
                    out.add(cur.toString());
                    cur = null;
                } else {
                    cur.append(c);
                }
            }
            return new FilesOffset(out);
        }
    }

    private FileSystem fs() throws IOException {
        return scan.rootPath().getFileSystem(scan.sconfConf());
    }

    @Override
    public Offset initialOffset() {
        // empty: the first batch ingests every file already present
        return new FilesOffset(new ArrayList<>());
    }

    @Override
    public Offset latestOffset() {
        try {
            List<String> names = new ArrayList<>();
            for (FileStatus f : BamDataSource.BamScan.listBamFiles(fs(), scan.rootPath())) {
                names.add(f.getPath().getName());
            }
            return new FilesOffset(names);
        } catch (IOException e) {
            throw new UncheckedIOException(e);
        }
    }

    @Override
    public Offset deserializeOffset(String json) {
        return FilesOffset.parse(json);
    }

    @Override
    public InputPartition[] planInputPartitions(Offset start, Offset end) {
        Set<String> seen = new HashSet<>(((FilesOffset) start).names);
        try {
            FileSystem fileSystem = fs();
            List<FileStatus> fresh = new ArrayList<>();
            for (String name : ((FilesOffset) end).names) {
                if (!seen.contains(name)) {
                    fresh.add(fileSystem.getFileStatus(
                            new org.apache.hadoop.fs.Path(scan.rootPath(), name)));
                }
            }
            return scan.planFiles(fileSystem, fresh);
        } catch (IOException e) {
            throw new UncheckedIOException(e);
        }
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
        return scan.createReaderFactory();
    }

    @Override
    public void commit(Offset end) {}

    @Override
    public void stop() {}
}
