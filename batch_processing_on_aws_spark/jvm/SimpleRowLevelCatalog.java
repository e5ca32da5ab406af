// In-memory DataSource V2 catalog whose tables support row-level
// operations, so Spark's own MERGE INTO / UPDATE / DELETE SQL executes
// end-to-end against it — no Delta/Iceberg jars required.
//
// This exists to exercise operators/merge.py::upsert_catalog_table (the
// engine-delegated K4/J3 upsert path, reference contract:
// airflow/dags/init_2_s3_to_redshifht_dag.py:63-74) with a REAL
// MERGE INTO execution. The design is the standard group-based
// (copy-on-write) shape of the Spark connector API: the whole table is
// ONE group, the row-level scan reads it, Spark's rewrite produces the
// group's complete post-operation content, and the operation's write
// commits by replacing the group. It is a test/dev harness — data lives
// on the driver — but the interfaces exercised are exactly the ones a
// production format (Delta, Iceberg) implements.
//
// Two non-obvious contract points, learned from Spark's physical plans:
//
// 1. The table MUST expose a metadata column and the operation MUST
//    require it. ReplaceDataExec picks the projecting write task
//    (DataAndMetadataWritingSparkTask) only when a metadata projection
//    exists; without one the writer would receive the rewrite plan's
//    raw [__row_operation | data...] rows unprojected. Real formats
//    always have such a column (Iceberg's _file, Delta's path) — here
//    it is `__group`, the constant 0 single group.
//
// 2. The writer must NOT persist `InternalRow.copy()` output. The rows
//    it receives are mutable ProjectingInternalRow wrappers re-projected
//    per input row, and their copy() clones the FULL underlying row
//    (operation column included). Extract the declared fields through
//    the row accessors and deep-copy buffer-borrowing values instead.
//
// Only public Spark connector APIs are used (org.apache.spark.sql.connector.*).
package sparkgraft.catalog;

import java.util.ArrayList;
import java.util.EnumSet;
import java.util.List;
import java.util.Map;
import java.util.Set;
import java.util.concurrent.ConcurrentHashMap;

import org.apache.spark.sql.catalyst.InternalRow;
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException;
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException;
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow;
import org.apache.spark.sql.connector.catalog.Identifier;
import org.apache.spark.sql.connector.catalog.MetadataColumn;
import org.apache.spark.sql.connector.catalog.SupportsMetadataColumns;
import org.apache.spark.sql.connector.catalog.SupportsRead;
import org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations;
import org.apache.spark.sql.connector.catalog.SupportsWrite;
import org.apache.spark.sql.connector.catalog.Table;
import org.apache.spark.sql.connector.catalog.TableCapability;
import org.apache.spark.sql.connector.catalog.TableCatalog;
import org.apache.spark.sql.connector.expressions.Expressions;
import org.apache.spark.sql.connector.expressions.NamedReference;
import org.apache.spark.sql.connector.expressions.Transform;
import org.apache.spark.sql.connector.read.Batch;
import org.apache.spark.sql.connector.read.InputPartition;
import org.apache.spark.sql.connector.read.PartitionReader;
import org.apache.spark.sql.connector.read.PartitionReaderFactory;
import org.apache.spark.sql.connector.read.Scan;
import org.apache.spark.sql.connector.read.ScanBuilder;
import org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns;
import org.apache.spark.sql.connector.write.BatchWrite;
import org.apache.spark.sql.connector.write.DataWriter;
import org.apache.spark.sql.connector.write.DataWriterFactory;
import org.apache.spark.sql.connector.write.LogicalWriteInfo;
import org.apache.spark.sql.connector.write.PhysicalWriteInfo;
import org.apache.spark.sql.connector.write.RowLevelOperation;
import org.apache.spark.sql.connector.write.RowLevelOperationBuilder;
import org.apache.spark.sql.connector.write.RowLevelOperationInfo;
import org.apache.spark.sql.connector.write.Write;
import org.apache.spark.sql.connector.write.WriteBuilder;
import org.apache.spark.sql.connector.write.WriterCommitMessage;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructField;
import org.apache.spark.sql.types.StructType;
import org.apache.spark.sql.util.CaseInsensitiveStringMap;

public class SimpleRowLevelCatalog implements TableCatalog {
  static final String GROUP_COLUMN = "__group";

  private final Map<Identifier, RowTable> tables = new ConcurrentHashMap<>();
  private String catalogName = "rowlvl";

  @Override
  public void initialize(String name, CaseInsensitiveStringMap options) {
    this.catalogName = name;
  }

  @Override
  public String name() {
    return catalogName;
  }

  @Override
  public Identifier[] listTables(String[] namespace) {
    return tables.keySet().toArray(new Identifier[0]);
  }

  @Override
  public Table loadTable(Identifier ident) throws NoSuchTableException {
    RowTable t = tables.get(ident);
    if (t == null) {
      throw new NoSuchTableException(ident);
    }
    return t;
  }

  @Override
  public Table createTable(
      Identifier ident,
      StructType schema,
      Transform[] partitions,
      Map<String, String> properties)
      throws TableAlreadyExistsException {
    if (tables.containsKey(ident)) {
      throw new TableAlreadyExistsException(ident);
    }
    RowTable t = new RowTable(catalogName + "." + ident, schema);
    tables.put(ident, t);
    return t;
  }

  @Override
  public Table alterTable(
      Identifier ident, org.apache.spark.sql.connector.catalog.TableChange... changes) {
    throw new UnsupportedOperationException("ALTER TABLE is not supported by this catalog");
  }

  @Override
  public boolean dropTable(Identifier ident) {
    return tables.remove(ident) != null;
  }

  @Override
  public void renameTable(Identifier from, Identifier to)
      throws NoSuchTableException, TableAlreadyExistsException {
    if (!tables.containsKey(from)) {
      throw new NoSuchTableException(from);
    }
    if (tables.containsKey(to)) {
      throw new TableAlreadyExistsException(to);
    }
    tables.put(to, tables.remove(from));
  }

  // ---- table ------------------------------------------------------------

  static class RowTable
      implements Table,
          SupportsRead,
          SupportsWrite,
          SupportsRowLevelOperations,
          SupportsMetadataColumns {
    private final String name;
    private final StructType schema;
    // driver-held rows in the TABLE schema layout; every access
    // synchronizes on this list
    final List<InternalRow> rows = new ArrayList<>();

    RowTable(String name, StructType schema) {
      this.name = name;
      this.schema = schema;
    }

    @Override
    public String name() {
      return name;
    }

    @Override
    public StructType schema() {
      return schema;
    }

    @Override
    public Set<TableCapability> capabilities() {
      return EnumSet.of(
          TableCapability.BATCH_READ,
          TableCapability.BATCH_WRITE,
          TableCapability.TRUNCATE);
    }

    @Override
    public MetadataColumn[] metadataColumns() {
      return new MetadataColumn[] {
        new MetadataColumn() {
          @Override
          public String name() {
            return GROUP_COLUMN;
          }

          @Override
          public DataType dataType() {
            return DataTypes.IntegerType;
          }

          @Override
          public boolean isNullable() {
            return false;
          }

          @Override
          public String comment() {
            return "copy-on-write group handle (single group: constant 0)";
          }
        }
      };
    }

    @Override
    public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
      return new RowScanBuilder(this);
    }

    @Override
    public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
      return new RowWrite(this, /* replace= */ false, info.schema());
    }

    @Override
    public RowLevelOperationBuilder newRowLevelOperationBuilder(RowLevelOperationInfo info) {
      return () -> new GroupRowLevelOperation(this, info.command());
    }
  }

  // ---- scan -------------------------------------------------------------

  static class RowScanBuilder implements ScanBuilder, SupportsPushDownRequiredColumns {
    private final RowTable table;
    private StructType required;

    RowScanBuilder(RowTable table) {
      this.table = table;
      this.required = table.schema();
    }

    @Override
    public void pruneColumns(StructType requiredSchema) {
      this.required = requiredSchema;
    }

    @Override
    public Scan build() {
      return new RowScan(table, required);
    }
  }

  static class RowScan implements Scan, Batch {
    private final RowTable table;
    private final StructType required;

    RowScan(RowTable table, StructType required) {
      this.table = table;
      this.required = required;
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
      InternalRow[] snapshot;
      synchronized (table.rows) {
        snapshot = table.rows.toArray(new InternalRow[0]);
      }
      return new InputPartition[] {new RowsPartition(snapshot)};
    }

    @Override
    public PartitionReaderFactory createReaderFactory() {
      // map each required field to its position in the stored layout;
      // -1 = the metadata group column (constant 0, single group)
      StructType tableSchema = table.schema();
      int[] srcIdx = new int[required.length()];
      DataType[] types = new DataType[required.length()];
      for (int i = 0; i < required.length(); i++) {
        StructField f = required.fields()[i];
        types[i] = f.dataType();
        srcIdx[i] = GROUP_COLUMN.equalsIgnoreCase(f.name()) ? -1
            : tableSchema.fieldIndex(f.name());
      }
      return new RowsReaderFactory(srcIdx, types);
    }
  }

  static class RowsPartition implements InputPartition {
    final InternalRow[] rows; // owned GenericInternalRow/UnsafeRow — Serializable

    RowsPartition(InternalRow[] rows) {
      this.rows = rows;
    }
  }

  static class RowsReaderFactory implements PartitionReaderFactory {
    private final int[] srcIdx;
    private final DataType[] types;

    RowsReaderFactory(int[] srcIdx, DataType[] types) {
      this.srcIdx = srcIdx;
      this.types = types;
    }

    @Override
    public PartitionReader<InternalRow> createReader(InputPartition partition) {
      InternalRow[] rows = ((RowsPartition) partition).rows;
      return new PartitionReader<InternalRow>() {
        private int i = -1;

        @Override
        public boolean next() {
          i += 1;
          return i < rows.length;
        }

        @Override
        public InternalRow get() {
          Object[] vals = new Object[srcIdx.length];
          for (int j = 0; j < srcIdx.length; j++) {
            if (srcIdx[j] < 0) {
              vals[j] = 0; // the single group's id
            } else if (!rows[i].isNullAt(srcIdx[j])) {
              vals[j] = rows[i].get(srcIdx[j], types[j]);
            }
          }
          return new GenericInternalRow(vals);
        }

        @Override
        public void close() {}
      };
    }
  }

  // ---- write ------------------------------------------------------------

  static class RowWrite implements WriteBuilder, Write, BatchWrite,
      org.apache.spark.sql.connector.write.SupportsTruncate {
    private final RowTable table;
    private boolean replace;
    private final StructType writeSchema;

    RowWrite(RowTable table, boolean replace, StructType writeSchema) {
      this.table = table;
      this.replace = replace;
      this.writeSchema = writeSchema;
    }

    @Override
    public WriteBuilder truncate() {
      this.replace = true;
      return this;
    }

    @Override
    public Write build() {
      return this;
    }

    @Override
    public BatchWrite toBatch() {
      return this;
    }

    @Override
    public DataWriterFactory createBatchWriterFactory(PhysicalWriteInfo info) {
      DataType[] types = new DataType[writeSchema.length()];
      for (int i = 0; i < types.length; i++) {
        types[i] = writeSchema.fields()[i].dataType();
      }
      return new BufferingWriterFactory(types);
    }

    @Override
    public void commit(WriterCommitMessage[] messages) {
      List<InternalRow> incoming = new ArrayList<>();
      for (WriterCommitMessage m : messages) {
        if (!(m instanceof RowsCommitMessage)) {
          // fail LOUD: a foreign message class here means the jar was
          // loaded twice under different classloaders (e.g. mounted
          // post-hoc via ADD JAR instead of at session creation) and
          // silently dropping the rows would corrupt the table
          throw new IllegalStateException(
              "unexpected commit message "
                  + (m == null ? "null" : m.getClass().getName())
                  + " — was the catalog jar added after session start?");
        }
        for (InternalRow r : ((RowsCommitMessage) m).rows) {
          incoming.add(r);
        }
      }
      synchronized (table.rows) {
        if (replace) {
          // group-based rewrite: incoming rows are the complete
          // post-operation content of every affected group; this
          // table is one group, so replace everything
          table.rows.clear();
        }
        table.rows.addAll(incoming);
      }
    }

    @Override
    public void abort(WriterCommitMessage[] messages) {}
  }

  static class BufferingWriterFactory implements DataWriterFactory {
    private final DataType[] types;

    BufferingWriterFactory(DataType[] types) {
      this.types = types;
    }

    @Override
    public DataWriter<InternalRow> createWriter(int partitionId, long taskId) {
      return new DataWriter<InternalRow>() {
        private final List<InternalRow> buffer = new ArrayList<>();

        @Override
        public void write(InternalRow row) {
          // extract immediately: `row` may be a mutable projection
          // wrapper reused for the next input row (contract point 2
          // in the file header)
          Object[] vals = new Object[types.length];
          for (int i = 0; i < types.length; i++) {
            vals[i] = row.isNullAt(i) ? null : ownedValue(row.get(i, types[i]));
          }
          buffer.add(new GenericInternalRow(vals));
        }

        @Override
        public void write(InternalRow metadata, InternalRow row) {
          // carried-over rows of the rewritten group arrive with their
          // metadata projection (the group id); the data row is all
          // this store persists
          write(row);
        }

        @Override
        public WriterCommitMessage commit() {
          return new RowsCommitMessage(buffer.toArray(new InternalRow[0]));
        }

        @Override
        public void abort() {}

        @Override
        public void close() {}
      };
    }

    /** Deep-copy values that borrow the (reused) input row buffer. */
    private static Object ownedValue(Object v) {
      if (v instanceof org.apache.spark.unsafe.types.UTF8String) {
        return ((org.apache.spark.unsafe.types.UTF8String) v).clone();
      }
      if (v instanceof byte[]) {
        return ((byte[]) v).clone();
      }
      if (v instanceof InternalRow) {
        return ((InternalRow) v).copy();
      }
      if (v instanceof org.apache.spark.sql.catalyst.util.ArrayData) {
        return ((org.apache.spark.sql.catalyst.util.ArrayData) v).copy();
      }
      if (v instanceof org.apache.spark.sql.catalyst.util.MapData) {
        return ((org.apache.spark.sql.catalyst.util.MapData) v).copy();
      }
      return v; // primitives, Decimal, CalendarInterval: immutable-by-use
    }
  }

  static class RowsCommitMessage implements WriterCommitMessage {
    final InternalRow[] rows;

    RowsCommitMessage(InternalRow[] rows) {
      this.rows = rows;
    }
  }

  // ---- row-level operation (group-based / copy-on-write) ----------------

  static class GroupRowLevelOperation implements RowLevelOperation {
    private final RowTable table;
    private final Command command;

    GroupRowLevelOperation(RowTable table, Command command) {
      this.table = table;
      this.command = command;
    }

    @Override
    public Command command() {
      return command;
    }

    @Override
    public ScanBuilder newScanBuilder(CaseInsensitiveStringMap options) {
      return new RowScanBuilder(table);
    }

    @Override
    public WriteBuilder newWriteBuilder(LogicalWriteInfo info) {
      return new RowWrite(table, /* replace= */ true, info.schema());
    }

    @Override
    public NamedReference[] requiredMetadataAttributes() {
      // requiring the group handle is what routes the rewrite through
      // the metadata-projecting write task (contract point 1 in the
      // file header)
      return new NamedReference[] {Expressions.column(GROUP_COLUMN)};
    }
  }
}
