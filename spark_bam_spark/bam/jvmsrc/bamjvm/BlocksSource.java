package bamjvm;

import java.io.IOException;
import java.io.Serializable;
import java.io.UncheckedIOException;
import java.util.ArrayList;
import java.util.Arrays;
import java.util.HashMap;
import java.util.HashSet;
import java.util.List;
import java.util.Map;
import java.util.Set;
import org.apache.hadoop.fs.BlockLocation;
import org.apache.hadoop.fs.FSDataInputStream;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.FileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableProvider;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;
import org.apache.spark.unsafe.types.UTF8String;

/**
 * JVM twin of the engine's BGZF blocks-metadata source (S9, the
 * reference's Blocks.scala:47-208 as behavior; Python twin:
 * bam/datasource.py BgzfBlocksDataSource): parallel in-file block
 * discovery — one partition per byte split, header-only walk (payloads
 * skipped), no sidecar required.  Same split-ownership rule as the
 * record reader: a split emits the blocks whose header starts in
 * [start, end), re-syncing on the first block boundary at/after start.
 *
 * Shares the record reader's planning conventions: adaptive split size,
 * byte-ranges option, locality hints, session Hadoop conf propagation.
 */
public class BlocksSource implements TableProvider {

    static StructType fullSchema() {
        return new StructType()
                .add("path", DataTypes.StringType)
                .add("start", DataTypes.LongType)
                .add("compressed_size", DataTypes.IntegerType)
                .add("uncompressed_size", DataTypes.IntegerType);
    }

    @Override
    public StructType inferSchema(CaseInsensitiveStringMap options) {
        return fullSchema();
    }

    @Override
    public Table getTable(StructType schema, Transform[] partitioning, Map<String, String> properties) {
        return new BlocksTable(new HashMap<>(properties));
    }

    static final class BlocksTable implements Table, SupportsRead {
        private final Map<String, String> properties;

        BlocksTable(Map<String, String> properties) {
            this.properties = properties;
        }

        @Override
        public String name() {
            return "bgzf_blocks_jvm(" + properties.getOrDefault("path", "?") + ")";
        }

        @Override
        public StructType schema() {
            return fullSchema();
        }

        @Override
        public Set<TableCapability> capabilities() {
            Set<TableCapability> caps = new HashSet<>();
            caps.add(TableCapability.BATCH_READ);
            return caps;
        }

        @Override
        public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
            return new BlocksScanBuilder(options.asCaseSensitiveMap());
        }
    }

    static final class BlocksScanBuilder implements ScanBuilder, SupportsPushDownRequiredColumns {
        private final Map<String, String> options;
        private StructType required = fullSchema();

        BlocksScanBuilder(Map<String, String> options) {
            this.options = options;
        }

        @Override
        public void pruneColumns(StructType requiredSchema) {
            this.required = requiredSchema;
        }

        @Override
        public Scan build() {
            return new BlocksScan(options, required,
                    new SerializableConf(SerializableConf.sessionHadoopConf()));
        }
    }

    static final class BlocksScan implements Scan, Batch {
        private final Map<String, String> options;
        private final StructType required;
        private final SerializableConf sconf;

        BlocksScan(Map<String, String> options, StructType required, SerializableConf sconf) {
            this.options = options;
            this.required = required;
            this.sconf = sconf;
        }

        @Override
        public StructType readSchema() {
            return required;
        }

        @Override
        public Batch toBatch() {
            return this;
        }

        @Override
        public InputPartition[] planInputPartitions() {
            String pathOpt = options.get("path");
            if (pathOpt == null) {
                throw new IllegalArgumentException("bgzf_blocks_jvm source requires a path");
            }
            try {
                Path root = new Path(pathOpt);
                FileSystem fs = root.getFileSystem(sconf.conf);
                List<FileStatus> files = new ArrayList<>();
                FileStatus rootStatus = fs.getFileStatus(root);
                if (rootStatus.isDirectory()) {
                    FileStatus[] children = fs.listStatus(root);
                    Arrays.sort(children, (a, b) -> a.getPath().getName().compareTo(b.getPath().getName()));
                    for (FileStatus c : children) {
                        if (c.isFile() && c.getPath().getName().endsWith(".bam")) {
                            files.add(c);
                        }
                    }
                } else {
                    files.add(rootStatus);
                }
                long splitSize;
                String sizeOpt = options.get("split_size");
                if (sizeOpt != null) {
                    splitSize = Long.parseLong(sizeOpt);
                } else {
                    long total = 0;
                    for (FileStatus f : files) {
                        total += f.getLen();
                    }
                    int cores = Runtime.getRuntime().availableProcessors();
                    splitSize = Math.max(4L << 20, Math.min(64L << 20, total / (4L * cores)));
                }
                String rangesOpt = options.get("ranges");
                List<long[]> byteRanges =
                        rangesOpt == null ? null : BamDataSource.BamScan.parseByteRanges(rangesOpt);
                // per-file locality RPC on a bounded pool (see
                // BamScan.mapFiles): file-order output keeps the plan
                // byte-identical to the sequential one
                final long splitSizeF = splitSize;
                List<List<InputPartition>> perFile = BamDataSource.BamScan.mapFiles(files, f -> {
                    BlockLocation[] blockLocs;
                    try {
                        blockLocs = fs.getFileBlockLocations(f, 0, f.getLen());
                    } catch (IOException e) {
                        blockLocs = new BlockLocation[0];
                    }
                    long size = f.getLen();
                    // the path COLUMN must match the Python twin's value
                    // (downstream QA pipelines open it directly): raw
                    // filesystem path for the local scheme, full URI for
                    // remote stores
                    String emitted = "file".equals(f.getPath().toUri().getScheme())
                            ? f.getPath().toUri().getPath()
                            : f.getPath().toString();
                    List<InputPartition> out = new ArrayList<>();
                    for (long s = 0; s < size; s += splitSizeF) {
                        long e = Math.min(s + splitSizeF, size);
                        out.add(new BlockSplit(emitted, s, e, byteRanges,
                                BamDataSource.BamScan.hostsFor(blockLocs, s, e)));
                    }
                    return out;
                });
                List<InputPartition> splits = new ArrayList<>();
                for (List<InputPartition> fileSplits : perFile) {
                    splits.addAll(fileSplits);
                }
                return splits.toArray(new InputPartition[0]);
            } catch (IOException e) {
                throw new UncheckedIOException(e);
            }
        }

        @Override
        public PartitionReaderFactory createReaderFactory() {
            return new BlocksReaderFactory(required, sconf);
        }
    }

    static final class BlockSplit implements InputPartition, Serializable {
        private static final long serialVersionUID = 1L;

        final String path;
        final long start;
        final long end;
        final long[][] byteRanges; // null = no selection
        final String[] hosts;

        BlockSplit(String path, long start, long end, List<long[]> byteRanges, String[] hosts) {
            this.path = path;
            this.start = start;
            this.end = end;
            this.byteRanges = byteRanges == null ? null : byteRanges.toArray(new long[0][]);
            this.hosts = hosts == null ? new String[0] : hosts;
        }

        @Override
        public String[] preferredLocations() {
            return hosts;
        }
    }

    static final class BlocksReaderFactory implements PartitionReaderFactory {
        private static final long serialVersionUID = 1L;

        private final StructType required;
        private final SerializableConf sconf;

        BlocksReaderFactory(StructType required, SerializableConf sconf) {
            this.required = required;
            this.sconf = sconf;
        }

        @Override
        public PartitionReader<InternalRow> createReader(InputPartition partition) {
            return new BlocksPartitionReader((BlockSplit) partition, required, sconf.conf);
        }
    }

    /**
     * Header-only block walk: positioned reads of the 18-byte BGZF
     * header plus the 4-byte ISIZE footer per block — no payload bytes
     * touched, no inflater.  Stops at split end (next split owns the
     * block starting there), at the standard ISIZE=0 EOF block, or at a
     * non-BGZF header (trailing garbage tolerated like the Python twin).
     */
    static final class BlocksPartitionReader implements PartitionReader<InternalRow> {
        private final BlockSplit split;
        private final StructField[] fields;
        private FSDataInputStream in;
        private final UTF8String pathStr;
        private long cpos;
        private boolean opened = false;
        private boolean done = false;
        private final byte[] head = new byte[Bgzf.HEADER_LEN];
        private final byte[] foot = new byte[4];
        private InternalRow current;
        private final org.apache.hadoop.conf.Configuration conf;

        BlocksPartitionReader(BlockSplit split, StructType required,
                org.apache.hadoop.conf.Configuration conf) {
            this.split = split;
            this.fields = required.fields();
            this.pathStr = UTF8String.fromString(split.path);
            this.conf = conf;
        }

        private void open() throws IOException {
            opened = true;
            Path p = new Path(split.path);
            FileSystem fs = p.getFileSystem(conf != null ? conf : new org.apache.hadoop.conf.Configuration());
            in = fs.open(p);
            if (split.start == 0) {
                cpos = 0;
                return;
            }
            byte[] probe = new byte[Bgzf.MAX_BLOCK_SIZE * 2];
            int got = readAt(split.start, probe, probe.length);
            int rel = got <= 0 ? -1 : Bgzf.findBlockStart(probe, got, 0);
            if (rel < 0) {
                done = true;
                return;
            }
            cpos = split.start + rel;
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

        @Override
        public boolean next() throws IOException {
            if (!opened) {
                open();
            }
            while (!done && cpos < split.end) {
                if (readAt(cpos, head, Bgzf.HEADER_LEN) < Bgzf.HEADER_LEN) {
                    done = true;
                    return false;
                }
                int bsize = Bgzf.parseBlockHeader(head, 0, Bgzf.HEADER_LEN);
                if (bsize < 0) {
                    done = true;
                    return false;
                }
                if (readAt(cpos + bsize - 4, foot, 4) < 4) {
                    done = true;
                    return false;
                }
                long isize = Bgzf.i32(foot, 0) & 0xFFFFFFFFL;
                if (isize == 0) {
                    done = true; // standard BGZF EOF block
                    return false;
                }
                long at = cpos;
                cpos += bsize;
                if (split.byteRanges != null) {
                    boolean hit = false;
                    for (long[] br : split.byteRanges) {
                        if (br[0] <= at && at < br[1]) {
                            hit = true;
                            break;
                        }
                    }
                    if (!hit) {
                        continue;
                    }
                }
                Object[] vals = new Object[fields.length];
                for (int i = 0; i < fields.length; i++) {
                    switch (fields[i].name()) {
                        case "path":
                            vals[i] = pathStr;
                            break;
                        case "start":
                            vals[i] = at;
                            break;
                        case "compressed_size":
                            vals[i] = bsize;
                            break;
                        case "uncompressed_size":
                            vals[i] = (int) isize;
                            break;
                        default:
                            throw new IllegalStateException("unknown column " + fields[i].name());
                    }
                }
                current = new GenericInternalRow(vals);
                return true;
            }
            return false;
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
    }
}
