package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import SqlBuilder.EqDeleteMeta

/** Golden SQL-text tests ported from the reference
  * (core/src/executor/datafusion/datafusion_processor.rs:714-1197).
  * Expected strings are the reference's own golden expectations. */
class SqlBuilderSpec extends AnyFunSuite {
  private val Data = "data_file_table"
  private val Pos = "position_delete_table"

  test("no deletes") {
    val sql = SqlBuilder.buildMergeOnReadSql(
      Seq("id", "name"), Some(Data), Some(Pos), Nil, needFilePathAndPos = false)
    assert(sql == "SELECT id, name FROM data_file_table")
  }

  test("position deletes only") {
    val sql = SqlBuilder.buildMergeOnReadSql(
      Seq("id", "name"), Some(Data), Some(Pos), Nil, needFilePathAndPos = true)
    assert(sql ==
      "SELECT id, name FROM (SELECT id, name, sys_hidden_file_path, sys_hidden_pos FROM position_delete_table RIGHT ANTI JOIN (SELECT id, name, sys_hidden_file_path, sys_hidden_pos FROM data_file_table) AS data_file_table ON data_file_table.sys_hidden_file_path = position_delete_table.sys_hidden_file_path AND data_file_table.sys_hidden_pos = position_delete_table.sys_hidden_pos) AS final_result")
  }

  test("equality deletes only") {
    val sql = SqlBuilder.buildMergeOnReadSql(
      Seq("id", "name"), Some(Data), Some(Pos),
      Seq(EqDeleteMeta("test", Seq("id"))), needFilePathAndPos = false)
    assert(sql ==
      "SELECT id, name FROM (SELECT id, name, sys_hidden_seq_num FROM test RIGHT ANTI JOIN (SELECT id, name, sys_hidden_seq_num FROM data_file_table) AS data_file_table ON test.id = data_file_table.id AND data_file_table.sys_hidden_seq_num < test.sys_hidden_seq_num) AS final_result")
  }

  test("both position and equality deletes") {
    val sql = SqlBuilder.buildMergeOnReadSql(
      Seq("id", "name"), Some(Data), Some(Pos),
      Seq(EqDeleteMeta("test", Seq("id"))), needFilePathAndPos = true)
    assert(sql ==
      "SELECT id, name FROM (SELECT id, name, sys_hidden_seq_num, sys_hidden_file_path, sys_hidden_pos FROM test RIGHT ANTI JOIN (SELECT id, name, sys_hidden_seq_num, sys_hidden_file_path, sys_hidden_pos FROM position_delete_table RIGHT ANTI JOIN (SELECT id, name, sys_hidden_seq_num, sys_hidden_file_path, sys_hidden_pos FROM data_file_table) AS data_file_table ON data_file_table.sys_hidden_file_path = position_delete_table.sys_hidden_file_path AND data_file_table.sys_hidden_pos = position_delete_table.sys_hidden_pos) AS data_file_table ON test.id = data_file_table.id AND data_file_table.sys_hidden_seq_num < test.sys_hidden_seq_num) AS final_result")
  }

  test("multiple equality delete schemas chain in order") {
    val sql = SqlBuilder.buildMergeOnReadSql(
      Seq("id", "name"), Some(Data), Some(Pos),
      Seq(EqDeleteMeta("test_1", Seq("id")), EqDeleteMeta("test_2", Seq("name"))),
      needFilePathAndPos = false)
    assert(sql ==
      "SELECT id, name FROM (SELECT id, name, sys_hidden_seq_num FROM test_2 RIGHT ANTI JOIN (SELECT id, name, sys_hidden_seq_num FROM test_1 RIGHT ANTI JOIN (SELECT id, name, sys_hidden_seq_num FROM data_file_table) AS data_file_table ON test_1.id = data_file_table.id AND data_file_table.sys_hidden_seq_num < test_1.sys_hidden_seq_num) AS data_file_table ON test_2.name = data_file_table.name AND data_file_table.sys_hidden_seq_num < test_2.sys_hidden_seq_num) AS final_result")
  }

  test("nested table alias regression: hidden cols present in every nesting level") {
    val sql = SqlBuilder.buildMergeOnReadSql(
      Seq("id", "item_name", "description"),
      Some("_data_file_table"), Some("_position_delete_table"),
      Seq(EqDeleteMeta("_equality_delete_table_0", Seq("id"))),
      needFilePathAndPos = true)
    assert(sql ==
      "SELECT id, item_name, description FROM (SELECT id, item_name, description, sys_hidden_seq_num, sys_hidden_file_path, sys_hidden_pos FROM _equality_delete_table_0 RIGHT ANTI JOIN (SELECT id, item_name, description, sys_hidden_seq_num, sys_hidden_file_path, sys_hidden_pos FROM _position_delete_table RIGHT ANTI JOIN (SELECT id, item_name, description, sys_hidden_seq_num, sys_hidden_file_path, sys_hidden_pos FROM _data_file_table) AS _data_file_table ON _data_file_table.sys_hidden_file_path = _position_delete_table.sys_hidden_file_path AND _data_file_table.sys_hidden_pos = _position_delete_table.sys_hidden_pos) AS _data_file_table ON _equality_delete_table_0.id = _data_file_table.id AND _data_file_table.sys_hidden_seq_num < _equality_delete_table_0.sys_hidden_seq_num) AS final_result")
  }

  test("equality deletes only, underscore-prefixed names") {
    val sql = SqlBuilder.buildMergeOnReadSql(
      Seq("id", "name"), Some("_data_file_table"), None,
      Seq(EqDeleteMeta("_equality_delete_table_0", Seq("id"))),
      needFilePathAndPos = false)
    assert(sql ==
      "SELECT id, name FROM (SELECT id, name, sys_hidden_seq_num FROM _equality_delete_table_0 RIGHT ANTI JOIN (SELECT id, name, sys_hidden_seq_num FROM _data_file_table) AS _data_file_table ON _equality_delete_table_0.id = _data_file_table.id AND _data_file_table.sys_hidden_seq_num < _equality_delete_table_0.sys_hidden_seq_num) AS final_result")
  }

  test("empty equality ids degenerate to seq-only condition") {
    val sql = SqlBuilder.buildMergeOnReadSql(
      Seq("id"), Some(Data), None,
      Seq(EqDeleteMeta("eq0", Nil)), needFilePathAndPos = false)
    assert(sql ==
      "SELECT id FROM (SELECT id, sys_hidden_seq_num FROM eq0 RIGHT ANTI JOIN (SELECT id, sys_hidden_seq_num FROM data_file_table) AS data_file_table ON data_file_table.sys_hidden_seq_num < eq0.sys_hidden_seq_num) AS final_result")
  }

  test("missing data table name raises") {
    assertThrows[graft.core.CompactionError.Execution] {
      SqlBuilder.buildMergeOnReadSql(Seq("id"), None, None, Nil, needFilePathAndPos = false)
    }
  }

  test("missing position delete table name raises when needed") {
    assertThrows[graft.core.CompactionError.Execution] {
      SqlBuilder.buildMergeOnReadSql(Seq("id"), Some(Data), None, Nil, needFilePathAndPos = true)
    }
  }

  test("table naming helpers") {
    assert(MergeOnRead.dataFileTableName("p") == "p_data_file_table")
    assert(MergeOnRead.positionDeleteTableName("p") == "p_position_delete_table")
    assert(MergeOnRead.equalityDeleteTableName("p", 2) == "p_equality_delete_table_2")
  }
}
