package graft.queries
import graft.QDef
object PipelineQueries { val defs: Seq[QDef] = Seq() }
