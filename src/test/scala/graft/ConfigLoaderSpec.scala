package graft

import graft.pipeline.ConfigLoader
import graft.sources.Connectors.MemorySink

class ConfigLoaderSpec extends SparkSpec {

  test("config-driven pipeline parses, describes, and runs") {
    val json = s"""
      |{"name": "cfg-copy",
      | "source": {"adaptor": "tables", "name": "fixtures",
      |            "dir": "$${SF_DIR}", "tables": ["region", "nation"]},
      | "sinks": [
      |   {"adaptor": "memory", "name": "m", "ns": "nation",
      |    "transforms": [
      |      {"fn": "rename", "field_map": {"n_name": "name"}},
      |      {"fn": "skip", "field": "n_nationkey", "operator": "<", "match": 10}
      |    ]}
      | ]}""".stripMargin
    val spec = ConfigLoader.parse(json, Map("SF_DIR" -> sf))
    assert(spec.describe.contains("Source: fixtures"))
    assert(spec.describe.contains("Transform: rename"))
    // swap in an inspectable sink instance
    val mem = new MemorySink
    val runnable = spec.copy(sinks =
      spec.sinks.map(s => s.copy(sink = mem)))
    runnable.run(spark)
    assert(mem.rows.size == 10) // nations 0..9
    assert(mem.rows.head.schema.fieldNames.contains("name"))
  }

  test("unknown names and missing env vars fail loudly") {
    intercept[IllegalArgumentException] {
      ConfigLoader.parse("""{"source": {"adaptor": "nope"}, "sinks": []}""")
    }
    intercept[IllegalArgumentException] {
      ConfigLoader.parse("""{"source": {"adaptor": "file", "uri": "${UNSET_VAR_XYZ}"},
        "sinks": [{"adaptor": "memory"}]}""")
    }
    val e = intercept[UnsupportedOperationException] {
      ConfigLoader.parse(
        """{"source": {"adaptor": "mongodb"},
           "sinks": [{"adaptor": "memory"}]}""")
    }
    assert(e.getMessage.contains("MongoDB Spark connector"))
  }
}
