package graft.queries
import graft.QDef
object VectorQueries { val defs: Seq[QDef] = Seq() }
